package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampNTZType, TimestampType}

import graft.Tables

/** Table profiling (north star utility) — the `ANALYZE TABLE` /
  * data-quality sweep every pipeline runs before trusting an input
  * drop: per-column null counts, distinct cardinalities and min/max
  * ranges, computed in ONE distributed pass.
  *
  * Shape: every statistic is an aggregate expression in a single
  * `agg(...)` over the scan (multiple `countDistinct`s plan as one
  * Expand + aggregate — |cols|× the scan's rows on the map side, but
  * still one job, no per-column re-scan); the 1-row result is then
  * unpivoted driver-free by a union of constant projections. At a
  * real 100 TB profile the exact `countDistinct` would move to
  * `approx_count_distinct` (HLL) — exact is kept here because the
  * oracle must replay the number bit-for-bit; the swap is one
  * function name per column.
  *
  * Engine-parity detail: min/max surface as DOUBLE for numeric and
  * timestamp columns (timestamps via integer epoch-µs) and as plain
  * strings for text columns — never engine-formatted number/timestamp
  * strings, whose renderings differ across engines.
  */
object Profiling {

  /** One profile row per column of `df`. */
  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      // count(*) − count(col): BIGINT in both engines (a SUM(CASE) is
      // HUGEINT in the oracle engine — a dtype mismatch, not a value one)
      val base = Seq(
        (count(lit(1)) - count(c)).as(s"${f.name}__nulls"),
        countDistinct(c).as(s"${f.name}__dist"))
      val range = f.dataType match {
        case _: NumericType => Seq(
          min(c).cast("double").as(s"${f.name}__min_num"),
          max(c).cast("double").as(s"${f.name}__max_num"),
          lit(null).cast("string").as(s"${f.name}__min_str"),
          lit(null).cast("string").as(s"${f.name}__max_str"))
        // parquet ms-timestamps surface as TIMESTAMP_NTZ here; the UTC
        // session makes the NTZ→TZ cast a no-op re-tag
        case TimestampType | TimestampNTZType => Seq(
          min(unix_micros(c.cast(TimestampType))).cast("double").as(s"${f.name}__min_num"),
          max(unix_micros(c.cast(TimestampType))).cast("double").as(s"${f.name}__max_num"),
          lit(null).cast("string").as(s"${f.name}__min_str"),
          lit(null).cast("string").as(s"${f.name}__max_str"))
        case StringType => Seq(
          lit(null).cast("double").as(s"${f.name}__min_num"),
          lit(null).cast("double").as(s"${f.name}__max_num"),
          min(c).as(s"${f.name}__min_str"),
          max(c).as(s"${f.name}__max_str"))
        case _ => Seq(
          lit(null).cast("double").as(s"${f.name}__min_num"),
          lit(null).cast("double").as(s"${f.name}__max_num"),
          lit(null).cast("string").as(s"${f.name}__min_str"),
          lit(null).cast("string").as(s"${f.name}__max_str"))
      }
      base ++ range
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    fields.map { f =>
      one.select(lit(f.name).as("column_name"),
        col(s"${f.name}__nulls").as("n_nulls"),
        col(s"${f.name}__dist").as("n_distinct"),
        col(s"${f.name}__min_num").as("min_num"),
        col(s"${f.name}__max_num").as("max_num"),
        col(s"${f.name}__min_str").as("min_str"),
        col(s"${f.name}__max_str").as("max_str"))
    }.reduce(_.unionByName(_)).orderBy("column_name")
  }

  /** `profile_orders`: the profile of the orders table. The order-date
    * column arrives as a raw nanos LONG under the deployment's
    * `nanosAsLong` reader flag (see [[Tables.events]]) — re-typed to a
    * timestamp first so it profiles as a time range, not an integer.
    */
  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.orders(spark, dir)
    val fixed =
      if (raw.schema("o_orderdate").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("o_orderdate", expr("timestamp_micros(o_orderdate div 1000)"))
      else raw
    profile(fixed)
  }
}
