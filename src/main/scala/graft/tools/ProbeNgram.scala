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
    // A/B the broadcast threshold in ONE session; minhash is the noise
    // canary (its code path is threshold-stable)
    for (t <- Seq("10485760", "67108864"); rep <- 1 to 2) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", t)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", t)
      time(s"minhash_lsh t=$t rep$rep")(println(Dedup.minHashLsh(spark, dir).count()))
      Dedup.retireCaches()
      System.gc() // let ContextCleaner reap dead broadcast/shuffle state
      time(s"ngram_jaccard t=$t rep$rep")(println(Dedup.ngramJaccard(spark, dir).count()))
      Dedup.retireCaches()
      System.gc()
    }
    spark.stop()
  }
}
