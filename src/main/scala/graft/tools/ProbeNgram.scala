package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators._

/** One-off timing probe for the heavy dedup operators, one clean run
  * each. args: [sfDir] [broadcastThresholdBytes]
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val thresh = args.lift(1).getOrElse("10485760")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", thresh)
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", thresh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngram] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"[ngram] threshold=$thresh")
    time("ngram_jaccard")(println(Dedup.ngramJaccard(spark, dir).count()))
    Dedup.retireCaches()
    time("minhash_lsh")(println(Dedup.minHashLsh(spark, dir).count()))
    Dedup.retireCaches()
    time("embedding_near_dup_lsh")(println(Dedup.embeddingNearDupLsh(spark, dir).count()))
    Dedup.retireCaches()
    time("simhash_pairs")(println(Dedup.simHashPairs(spark, dir).count()))
    Dedup.retireCaches()
    spark.stop()
  }
}
