package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (ScalaTest runs them in one
  * JVM; `getOrCreate` returns the same session everywhere).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // local[4,2]: 4 threads, maxFailures=2 — task retry must be ON so the
    // crash-injection spec (MapReduceSpec) can exercise re-execution the
    // way the reference's crash test does; retries are inert elsewhere.
    val s = SparkSession.builder()
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf: String = "/root/testdata/sf0.001"
}
