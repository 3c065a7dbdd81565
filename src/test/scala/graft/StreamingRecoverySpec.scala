package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming checkpoint recovery — the Structured-Streaming twin of the
  * batch crash differential (`MapReduceSpec`'s first-attempt-throws
  * test): a stateful aggregation is STOPPED mid-input and restarted
  * against the same checkpoint; the restarted query must resume from
  * the persisted offsets+state, not reprocess, and the final result
  * must equal the batch aggregate over everything. This is the
  * fault-tolerance contract a production `writeStream` relies on
  * (driver loss, upgrade, rebalance): offsets and state live in the
  * checkpoint, not the process.
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(prefix: String): Path = SparkTestSession.tmpDir(prefix)

  test("stateful aggregation resumes from checkpoint across a restart") {
    import spark.implicits._
    val in = tmpDir("graft-stream-in")
    val ckpt = tmpDir("graft-stream-ckpt")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", LongType)))

    def startQuery(name: String) = {
      val agg = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(in.toString)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
      agg.writeStream.outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt.toString)
        .format("memory").queryName(name).start()
    }

    // the file-stream source lists plain FILES (the testdata layout);
    // a Spark write creates a directory, so relocate its single part
    def writeFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = tmpDir(s"graft-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, in.resolve(name))
    }

    val batchA = (1L to 40L).map(i => (i % 5, i)).toDF("user_id", "value")
    writeFile(batchA, "a.parquet")
    val q1 = startQuery("recovery_phase1")
    try q1.processAllAvailable() finally q1.stop()
    val afterA = spark.table("recovery_phase1").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Long]("total"))).toSet

    // second tranche lands while no query is running (the "crash" window)
    val batchB = (41L to 100L).map(i => (i % 5, i)).toDF("user_id", "value")
    writeFile(batchB, "b.parquet")

    val q2 = startQuery("recovery_phase2")
    try q2.processAllAvailable() finally q2.stop()
    val afterB = spark.table("recovery_phase2").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Long]("total"))).toSet

    // the restarted query consumed only tranche B (offsets from the
    // checkpoint) yet its totals include tranche A (state from the
    // checkpoint) — equal to the batch aggregate over everything
    val want = batchA.union(batchB).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("total")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Long]("total"))).toSet
    assert(afterB == want, "restart must recover offsets AND state from the checkpoint")
    val wantA = batchA.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("total")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n"), r.getAs[Long]("total"))).toSet
    assert(afterA == wantA, "phase-1 canary: pre-crash state matches tranche A")
    assert(afterA != afterB, "tranche B must actually change the state")
  }
}
