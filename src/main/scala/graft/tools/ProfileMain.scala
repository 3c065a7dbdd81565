package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Ad-hoc profiling entry for performance work (not part of the driver
  * contract). Times sub-stages of the heavy operators and reports the
  * candidate-pair volumes that decide whether the banded dedups scale.
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
      // mirror the Bench session's size-based broadcast budget
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // --- simhash pair candidates: is a band bucket hot? -------------------
    val sigs = Dedup.simHash(spark, dir).cache()
    time("simhash signatures")(println(sigs.count()))
    val bandStructs = (0 until Dedup.SimHashBands).map { b =>
      struct(lit(b).as("band"),
        substring(col("simhash"), b * Dedup.SimHashBandBits + 1, Dedup.SimHashBandBits).as("bkey"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    println("[profile] top simhash band buckets:")
    bands.groupBy("band", "bkey").count().orderBy(col("count").desc).show(10, false)
    val shCand = bands.as("x").join(bands.as("y"), Seq("band", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("simhash candidate pairs")(println(shCand.count()))
    time("dedup_simhash_pairs full")(println(Dedup.simHashPairs(spark, dir).count()))
    Dedup.retireCaches(); sigs.unpersist()

    // --- embedding LSH candidates ----------------------------------------
    time("embedding_near_dup_lsh full")(println(Dedup.embeddingNearDupLsh(spark, dir).count()))
    Dedup.retireCaches()
    time("embedding_near_dup exact O(n^2)")(println(Dedup.embeddingNearDup(spark, dir).count()))

    // --- ngram jaccard: prefix candidate volume ---------------------------
    time("dedup_ngram_jaccard full")(println(Dedup.ngramJaccard(spark, dir).count()))
    Dedup.retireCaches()

    // --- ngram jaccard stages ---------------------------------------------
    {
      import org.apache.spark.sql.functions._
      val sh = Tables.documents(spark, dir).count()
      println(s"[profile] documents rows: $sh")
    }

    // --- q3/q5 under the Bench session config -----------------------------
    time("q3")(println(Relational.q3ShippingPriority(spark, dir).count()))
    time("q5")(println(Relational.q5LocalSupplier(spark, dir).count()))
    time("q3 again")(println(Relational.q3ShippingPriority(spark, dir).count()))
    spark.stop()
  }
}
