package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column bindings for Spark's NATIVE bloom-filter expressions — the
  * same `BloomFilterAggregate`/`BloomFilterMightContain` pair the
  * engine's runtime row-group filters inject, exposed for explicit
  * store-vs-batch pre-filters ([[graft.operators.Dedup.incrementalBloom]]).
  * Unlike a Scala-UDF probe, `might_contain` over a binary literal is
  * a codegen'd expression: it stays inside WholeStageCodegen and the
  * optimizer can reason about it. Both sides hash with `xxhash64`
  * (the engine's own convention for these filters), so build and probe
  * agree on the key space.
  */
object BloomFunctions {
  private val AggName = "graft_bloom_agg"
  private val ProbeName = "graft_bloom_might_contain"

  /** Register once per session; idempotent, and guarded so repeat
    * calls do not spam "replaced a previously registered function"
    * warnings through every bench/gate log.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(AggName))) {
      reg.createOrReplaceTempFunction(
        AggName,
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
          .toAggregateExpression(),
        "built-in")
      reg.createOrReplaceTempFunction(
        ProbeName, exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    }
  }

  /** Standard bloom sizing: bits = −n·ln p / (ln 2)² (what
    * `util.sketch.BloomFilter.optimalNumOfBits` computes), floored at
    * one word so degenerate stores still build a valid filter.
    */
  def optimalNumOfBits(n: Long, p: Double): Long =
    math.max(64L, math.ceil(-n.toDouble * math.log(p)
      / (math.log(2) * math.log(2))).toLong)

  /** [[optimalNumOfBits]] clamped to the session's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` —
    * `BloomFilterAggregate` FAILS ANALYSIS above that cap (default
    * 2²⁶ bits ≈ 9.2 M keys at fpp 0.03), so an unclamped build would
    * crash on exactly the store sizes the filter exists for. Clamping
    * trades fpp for validity: the probe is one-sided either way (a
    * false positive only routes a row to the exact anti-join), so a
    * degraded filter stays CORRECT, just less selective.
    */
  def clampedNumOfBits(spark: SparkSession, n: Long, p: Double): Long = {
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    math.min(optimalNumOfBits(n, p), maxBits)
  }

  /** Aggregate a column into a serialized bloom filter (binary) — a
    * distributed partial-aggregating build, filter-sized output. The
    * input column is hashed with `xxhash64` here; probe with
    * [[mightContain]] so the hash convention matches.
    */
  def bloomAgg(spark: SparkSession, keyCol: Column, expectedItems: Long,
      fpp: Double): Column = {
    register(spark)
    call_function(AggName, xxhash64(keyCol), lit(expectedItems),
      lit(clampedNumOfBits(spark, expectedItems, fpp)))
  }

  /** Codegen'd membership probe of a [[bloomAgg]]-built filter. */
  def mightContain(spark: SparkSession, bloom: Column, keyCol: Column): Column = {
    register(spark)
    call_function(ProbeName, bloom, xxhash64(keyCol))
  }
}
