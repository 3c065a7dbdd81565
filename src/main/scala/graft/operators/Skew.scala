package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation for hot join keys (the technique several operator
  * docstrings defer to "salting in production" — here made concrete
  * and result-equivalence-tested, like the bucketed co-located join
  * audit in `PlanAuditSpec`).
  *
  * AQE's skew-join handles sort-merge skew by splitting oversized
  * partitions, but only OUTER shuffle stages it can observe; salting is
  * the plan-level fix that works everywhere, including under
  * ShuffledHashJoin and inside cached/checkpointed subtrees.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways: the fact
    * side's hot key is split across `salts` shuffle partitions instead
    * of landing on one straggler task, at the cost of replicating the
    * (small) dim side `salts` times.
    *
    * Mechanics: each fact row gets a DETERMINISTIC salt in [0, salts)
    * hashed from the whole row (retry-safe — `rand()` would re-salt on
    * task re-execution and break exactly-once row matching); the dim
    * side is exploded once per salt value; the join key becomes
    * (key, salt), so every fact row still meets every dim row with its
    * key exactly once and the result is row-identical to the unsalted
    * join. The shuffle hash-partitions on (key, salt) — asserted in
    * `PlanAuditSpec` — which is what spreads the hot key.
    *
    * Limitation: the salt is a pure function of row CONTENT, so
    * byte-identical duplicate rows share one salt and stay co-located —
    * determinism's price. If the hot key's rows are exact duplicates,
    * run exact dedup first ([[Dedup.exact]] is the canonical opening
    * pass) or add a discriminator column upstream.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("graft_salt") && !dim.columns.contains("graft_salt"),
      "inputs must not already carry a graft_salt column")
    val factCols = fact.columns.map(col)
    val salted = fact.withColumn("graft_salt",
      pmod(xxhash64(factCols: _*), lit(salts.toLong)))
    val replicated = dim.withColumn("graft_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "graft_salt")).drop("graft_salt")
  }

  /** [[saltedJoin]] driven end-to-end under the oracle gate: each
    * event's share of its user's total spend. The user-totals dim is
    * derived from events, then joined BACK to the event fact salted 8
    * ways — the exact hot-user shape the salt exists for (one whale
    * user's events land on 8 shuffle partitions instead of one
    * straggler task). The oracle is the PLAIN join SQL: salting must be
    * result-invisible, so a hash mismatch here would catch any
    * replicate/salt bug, not just a perf regression. Decimal totals,
    * double division, round(6) — deterministic on both engines.
    */
  def eventShareOfUser(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val totals = ev.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,2)")).as("user_value"))
    // a user netting to exactly 0.00 would make share an engine-divergent
    // 0-division (Spark Infinity/NaN vs DuckDB NULL) — excluded explicitly
    saltedJoin(ev, totals.filter(col("user_value") =!= 0), "user_id", salts = 8)
      .select(col("event_id"), col("user_id"),
        round(col("value").cast("decimal(18,2)").cast("double")
          / col("user_value").cast("double"), 6).as("share"))
      .orderBy("event_id")
  }
}
