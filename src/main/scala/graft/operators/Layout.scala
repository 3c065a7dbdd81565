package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout operators (north star) — how rows are ARRANGED into
  * files so that per-file min/max statistics prune multi-dimensional
  * point and range queries, the `OPTIMIZE ZORDER BY` of Delta/Iceberg
  * re-expressed as a declarative plan.
  *
  * A single-column sort prunes only its own column: sort events by
  * time and a `user_id = X` query still touches every file. Z-ordering
  * interleaves the BITS of both dimensions' bucket numbers into one
  * sort key, so a z-contiguous file spans a small rectangle in
  * (user, time) space and BOTH dimensions prune. [[zorderStats]]
  * computes the per-file skipping statistics a lakehouse table format
  * would persist in its manifest; `OperatorsSpec` quantifies the
  * pruning win against the linear time-sorted layout.
  */
object Layout {

  /** Bits per dimension; the z-value is 2·[[Bits]] wide. */
  val Bits = 16

  /** File split = top z bits: 2^(2·Bits − FileShift) z-range files. */
  val FileShift = 26

  /** Bit-interleave two [[Bits]]-wide bucket columns (even bits = the
    * second dim, odd = the first) — unrolled into a codegen-friendly
    * sum of shift/mask terms; the oracle generates the identical
    * expression from the same loop.
    */
  private def interleave(bu: Column, bt: Column): Column =
    (0 until Bits).map { i =>
      shiftright(bu, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(bt, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** `layout_zorder`: per-z-range-file skipping statistics for the
    * events table laid out by z(user_id, ts).
    *
    * Shape: one 1-row global min/max aggregate (broadcast back), then
    * a MAP-ONLY bucket + interleave pass, then one combiner-friendly
    * per-file aggregate — the corpus never shuffles on a row key. In a
    * real write the same z-value would feed `repartitionByRange(zv)`
    * and a sorted write; the statistics this query emits are exactly
    * the manifest entries that write would produce. Bucket scaling is
    * pure INTEGER arithmetic (multiply before `div`, clamped
    * denominator) so bucket edges are engine-exact.
    */
  def zorderStats(spark: SparkSession, dir: String): DataFrame = {
    val scale = (1L << Bits) - 1
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val mm = e.agg(min("user_id").as("umin"), max("user_id").as("umax"),
      min("us").as("tmin"), max("us").as("tmax"))
    e.crossJoin(broadcast(mm))
      .withColumn("bu", expr(s"(user_id - umin) * $scale div greatest(umax - umin, 1)"))
      .withColumn("bt", expr(s"(us - tmin) * $scale div greatest(tmax - tmin, 1)"))
      .withColumn("file_no", shiftright(interleave(col("bu"), col("bt")), FileShift))
      .groupBy("file_no")
      .agg(count(lit(1)).as("n_rows"),
        min("user_id").as("u_min"), max("user_id").as("u_max"),
        min("us").as("t_min"), max("us").as("t_max"))
      .orderBy("file_no")
  }
}
