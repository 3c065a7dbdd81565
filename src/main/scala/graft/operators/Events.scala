package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-stream analytics over the `events` table (batch side; the
  * streaming twins live in [[graft.streaming.EventStream]]).
  */
object Events {

  /** Tumbling 1-hour windows per event type: the canonical time-series
    * rollup. Spark's `window()` produces a struct; we surface the window
    * start via `date_trunc` so the oracle SQL is a plain `date_trunc`
    * too. Partial aggregation keeps the shuffle at |windows × types|.
    */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
           countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour", "event_type")

  /** JSON extraction from the `props` column: `get_json_object` is
    * codegen'd; at scale prefer extracting once and projecting.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
              get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") >= 50)
      .orderBy("event_id")

  /** Sessionization: a session breaks after a 30-minute silence per
    * user. Classic gaps-and-islands with `lag` + running sum — one
    * shuffle on user_id, everything else inside the window. The
    * streaming analogue with `flatMapGroupsWithState` is in
    * [[graft.streaming.EventStream]].
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMicros = 30L * 60 * 1000000 // compare in µs: exact in both engines
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
         unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros)
          .cast("long"))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
           min("ts").as("session_start"),
           max("ts").as("session_end"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Per-user behavior profile: pivot-style conditional aggregation. */
  def userProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"),
        sum(when(col("event_type") === "purchase", col("value").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("purchase_value"),
        min("ts").as("first_seen"),
        max("ts").as("last_seen"))
      .orderBy("user_id")
}
