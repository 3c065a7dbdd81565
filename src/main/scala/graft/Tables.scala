package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs on sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, at
  * production scale, on any parquet-backed table location. Reads go through
  * `spark.read.parquet` so Catalyst gets column pruning and filter pushdown
  * at the scan (verified in specs via `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively; with `spark.sql.legacy.parquet.nanosAsLong` it comes
    * back as a long we truncate to µs (exactly what DuckDB's reader does,
    * keeping the oracle in lockstep). Integer `div`, not `/` — nanos
    * exceed 2^53 so double math would lose precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
