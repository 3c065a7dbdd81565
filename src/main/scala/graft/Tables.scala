package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

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
  /** The driver regenerates `events.parquet` between rounds and has
    * shipped `ts` in several encodings; [[normalizeEventTs]] dispatches
    * on the LOADED type so every downstream `unix_micros(ts)` call site
    * sees one canonical TIMESTAMP (µs instants, session TZ pinned UTC):
    *
    *  - `LongType`: parquet TIMESTAMP(NANOS), which Spark 4 only reads
    *    under `spark.sql.legacy.parquet.nanosAsLong` (set at SESSION
    *    construction — Bench/Verify/tests all do) as a raw nanos long;
    *    truncate to µs exactly like DuckDB's reader, keeping the oracle
    *    in lockstep. Integer `div`, not `/` — nanos exceed 2^53 so
    *    double math would lose precision.
    *  - `TimestampNTZType`: parquet TIMESTAMP_MICROS isAdjustedToUTC=0.
    *    Under the pinned-UTC session, `cast(TimestampType)` preserves
    *    the stored micro-instant bit-for-bit (the cast reinterprets the
    *    wall clock in the session zone = UTC), and DuckDB reads the
    *    same file as a naive timestamp — identical instants both sides.
    *  - `TimestampType`: TIMESTAMP_MICROS isAdjustedToUTC=1 —
    *    already canonical, pass through.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

  /** The `ts` type as stored in the file (footer-only read) — the
    * stream reader needs it up front because a file stream source
    * requires a user-supplied schema.
    */
  private[graft] def eventsRawTsType(s: SparkSession, d: String): DataType =
    table(s, d, "events").schema("ts").dataType

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
