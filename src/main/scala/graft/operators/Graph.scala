package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-dup similarity graph (north star; the
  * reference has no graph operators — its closest surface is the
  * indexer's doc↔term incidence). The dedup family already builds a
  * real graph — verified ngram-Jaccard pairs ([[Dedup.ngramJaccard]])
  * — and labels its components ([[Dedup.clusters]]); this object adds
  * the ITERATIVE-SCORING workload class on the same edges. PageRank
  * over the duplication graph is the practical centrality for corpus
  * hygiene: a page whose near-duplicates are themselves widely
  * duplicated (template hubs, boilerplate families, SEO mirror rings)
  * outranks one with the same degree but peripheral neighbors, so the
  * score surfaces the template CORES that representative-per-cluster
  * dedup should keep (or drop wholesale) first.
  */
object Graph {

  /** Standard damping (Brin/Page). */
  val PrDamping = 0.85
  /** Teleport mass, written as the exact literal 0.15 so both engines
    * parse the identical double (1.0 − 0.85 in binary64 is NOT the
    * double nearest 0.15).
    */
  val PrResid = 0.15
  /** Fixed power-iteration rounds — determinism over adaptivity, the
    * [[KMeansCodebook.LloydIters]] contract.
    */
  val PrIters = 10

  private def r12(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** `graph_pagerank`: damped PageRank over the symmetric near-dup
    * graph, [[PrIters]] fixed power-iteration rounds from a uniform
    * start. The graph has no dangling nodes by construction (symmetric
    * edges ⇒ every node has out-degree ≥ 1), so the update is exactly
    * pr′(v) = (1−d)/n + d·Σ_{u∼v} pr(u)/deg(u) and total mass stays 1
    * (spec-pinned).
    *
    * Determinism across engines — float summation order is the enemy:
    * each round's contributions pr(u)/deg(u) round to 12dp and sum as
    * DECIMAL (order-exact); the damped update then rounds back to 12dp.
    * Constants interpolate as exact literals shared with the oracle's
    * CTE chain, which replays the identical [[PrIters]] rounds.
    *
    * Scale shape: the loop runs over EDGE-INCIDENT nodes only (the
    * [[Dedup.clustersFromEdges]] decision — the dup graph is a tiny
    * fraction of the corpus; singletons' rank is the closed-form
    * teleport constant and needs no iteration). Each round is one
    * equi-join of the edge list against the node-sized rank frame plus
    * one combiner-friendly sum per destination; rank frames localCheckpoint
    * per round, so the plan stays flat at any round count (the
    * [[Bpe]] depth-probe contract). The driver sees only the node
    * COUNT, never node data.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccard(spark, dir).select("doc_a", "doc_b")
    val sym = Kernels.cacheTracked(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("doc_id"), col("deg"))
      .localCheckpoint()
    val n = deg.count()
    require(n > 0, "graph_pagerank needs at least one near-dup edge")
    val teleport = PrResid / n.toDouble
    // the rank frame carries its own key name (pid) so each round's
    // join against the static edge/degree frames can never alias
    var pr = deg.select(col("doc_id").as("pid"), lit(r12(1.0 / n.toDouble)).as("pr"))
      .localCheckpoint()
    for (i <- 1 to PrIters) {
      val next = sym
        .join(pr, col("src") === col("pid"))
        .join(deg, col("src") === col("doc_id"))
        .select(col("dst"),
          round(col("pr") / col("deg"), 12).cast("decimal(22,12)").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
        .select(col("dst").as("pid"),
          round(lit(teleport) + lit(PrDamping) * col("s").cast("double"), 12)
            .as("pr"))
      // cut lineage every third round: enough to keep the plan flat at
      // any round count while not paying an eager checkpoint job per
      // round (on node-sized frames job launch, not compute, is what a
      // checkpoint costs)
      pr = if (i % 3 == 0 || i == PrIters) next.localCheckpoint() else next
    }
    pr.join(deg, col("pid") === col("doc_id"))
      .select(col("doc_id"), col("deg"), col("pr").as("pagerank"))
      .orderBy("doc_id")
  }
}
