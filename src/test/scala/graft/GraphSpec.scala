package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Graph-family invariants the hash gate can't express: exact triangle
  * counts on synthetic graphs with known answers, the mutuality and
  * degree-bound contracts of the kNN graph, link-prediction soundness,
  * and TextRank mass conservation.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  test("triangle counts are exact on known graphs (orientation is physical only)") {
    // K4: 4 triangles total, every node in exactly C(3,2) = 3
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r4 = Graph.triangleCounts(k4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tri")).toMap
    assert(r4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a 4-cycle has no triangles but every node has degree 2
    val c4 = Graph.triangleCounts(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))).collect()
    assert(c4.forall(_.getAs[Long]("n_tri") == 0L))
    assert(c4.forall(_.getAs[Long]("deg") == 2L))
    // hub-and-spoke (star): high degree, zero triangles — the shape the
    // degree ordering is built to survive; add one rim edge → exactly
    // one triangle at {hub, 2, 3}
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    assert(Graph.triangleCounts(star).collect()
      .forall(_.getAs[Long]("n_tri") == 0L))
    val starPlus = Graph.triangleCounts(
      edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (2L, 3L)))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tri")).toMap
    assert(starPlus == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L,
      5L -> 0L, 6L -> 0L))
  }

  test("mutual-kNN edges are mutual, canonical, and degree-bounded") {
    val e = Graph.mutualKnn(spark, sf).collect()
    Kernels.retireCaches()
    assert(e.nonEmpty)
    val pairs = e.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.forall { case (a, b) => a < b }, "edges must be canonical")
    assert(pairs.distinct.length == pairs.length, "no duplicate edges")
    // degree bound: a node appears in at most KnnK mutual edges, since
    // mutuality is a subset of its directed top-k
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map(_._2.size)
    assert(deg.max <= Graph.KnnK,
      s"mutual degree ${deg.max} exceeds k=${Graph.KnnK}")
  }

  test("common-neighbor candidates are non-edges with support >= 2 and degree-consistent scores") {
    val edgeSet = Graph.mutualKnn(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    Kernels.retireCaches()
    val cand = Graph.commonNeighbors(spark, sf).collect()
    Kernels.retireCaches()
    assert(cand.nonEmpty)
    cand.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(a < b)
      assert(!edgeSet.contains((a, b)),
        s"($a,$b) is already a mutual-kNN edge — link prediction must only propose NEW pairs")
      assert(r.getAs[Long]("common") >= 2L)
      // Jaccard bound: common/(dega+degb-common) with deg <= k each
      assert(r.getAs[Double]("link_score") > 0.0 &&
        r.getAs[Double]("link_score") <= 1.0)
    }
  }

  test("textrank conserves probability mass and ranks every co-occurring term") {
    val rows = Graph.textRank(spark, sf).collect()
    Kernels.retireCaches()
    assert(rows.nonEmpty)
    // no dangling nodes (symmetric edges) + 12dp rounding per round →
    // total mass stays 1 up to accumulated rounding drift
    val mass = rows.map(_.getAs[Double]("textrank")).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"mass $mass drifted from 1")
    // descending by score with the term tiebreak — the declared order
    val scores = rows.map(r => (r.getAs[Double]("textrank"), r.getAs[String]("term")))
    val resorted = scores.sortBy { case (s, t) => (-s, t) }.toSeq
    assert(scores.toSeq == resorted)
  }
}
