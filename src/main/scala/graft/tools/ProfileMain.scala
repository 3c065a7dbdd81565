package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Ad-hoc profiling entry for performance work (not part of the driver
  * contract). Times sub-stages of the heavy operators.
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val toks = filter(split(lower(col("text")), "[^\\p{L}]+"), t => length(t) > 0)
    val shArr = docs.select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), Dedup.shingles(col("toks"), 3).as("sh"))
    val ex = shArr.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode shingles count")(println(ex.count()))
    val sigCols = (0 until 16).map(i => min(md5(concat_ws(":", lit(i), col("s")))).as(s"h$i"))
    val sigs = ex.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    time("sigs count")(println(sigs.count()))
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until 4).map(r => col(s"h${4 * b + r}")): _*).as("bkey"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    time("bands count")(println(bands.count()))
    val cand = bands.as("x").join(bands.as("y"), Seq("band", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("cand count")(println(cand.count()))
    val inter = size(array_intersect(col("A.sh"), col("B.sh"))).cast("double")
    val out = cand
      .join(shArr.as("A"), col("doc_a") === col("A.doc_id"))
      .join(shArr.as("B"), col("doc_b") === col("B.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(inter / (size(col("A.sh")) + size(col("B.sh")) - inter), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
    time("verified count")(println(out.count()))
    time("full operator")(println(Dedup.minHashLsh(spark, dir).count()))
    time("ngram_jaccard")(println(Dedup.ngramJaccard(spark, dir).count()))
    time("q3")(println(Relational.q3ShippingPriority(spark, dir).count()))
    time("embedding_near_dup")(println(Dedup.embeddingNearDup(spark, dir).count()))
    time("ann_topk")(println(Similarity.annTopK(spark, dir).count()))
    spark.stop()
  }
}
