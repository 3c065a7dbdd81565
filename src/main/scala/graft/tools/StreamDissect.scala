package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Perf dissection of one streaming drain (not part of the driver
  * contract): replicates the windowed-count stream and phase-stamps
  * build/start/drain plus each micro-batch's `recentProgress`
  * durations and state-operator commit times — the evidence behind
  * the r19 state-store key-budget change (per-store per-batch fixed
  * cost vs key count).
  *
  * Usage: sbt "runMain graft.tools.StreamDissect [statePartitions]"
  * (env: SPARK_GRAFT_SF_DIR as in Bench; default partitions 8 vs 2
  * reproduces the A/B).
  */
object StreamDissect {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val parts = args.headOption.getOrElse("2")
    val spark = graft.GraftSession.builder("local[32]", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      def m(tag: String): Unit =
        println(f"[dissect] rep$rep $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
      val tsType = graft.Tables.eventsRawTsType(spark, dir)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", tsType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      val src = graft.Tables.normalizeEventTs(
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
      m("sourceBuilt")
      val agg = src.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").as("hour"), col("event_type"), col("n_events"))
      val name = s"dissect_out_$rep"
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val q = agg.writeStream.outputMode(OutputMode.Append())
          .format("memory").queryName(name).start()
        m("started")
        q.processAllAvailable()
        m("drained")
        q.recentProgress.foreach { p =>
          val dur = Option(p.durationMs).map(_.toString).getOrElse("")
          println(s"[dissect] rep$rep batch=${p.batchId} rows=${p.numInputRows} $dur")
          p.stateOperators.foreach { so =>
            println(s"[dissect] rep$rep   state: updates=${so.allUpdatesTimeMs}ms " +
              s"commitSum=${so.commitTimeMs}ms rows=${so.numRowsTotal}")
          }
        }
        q.stop()
        m("stopped")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val n = spark.table(name).orderBy("hour", "event_type").count()
      m(s"downstreamCount($n)")
      graft.operators.Dedup.retireCaches()
      System.gc()
    }
    spark.stop()
  }
}
