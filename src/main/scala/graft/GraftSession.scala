package graft

import org.apache.spark.sql.SparkSession

/** The single SparkSession.Builder every graft entry point starts
  * from. The settings here are CORRECTNESS-BEARING, not tuning:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong` — round ≤5 testdata ships
  *    `events.ts` as parquet TIMESTAMP(NANOS), which Spark 4 refuses
  *    to read without this flag; [[Tables.normalizeEventTs]] then
  *    dispatches on the loaded type. An entry point built without the
  *    flag throws at read time on nanos data (the failure mode a
  *    round-6 driver re-encode exposed).
  *  - session timezone pinned UTC — the NTZ-encoding normalization and
  *    every date_trunc/window boundary depend on it matching DuckDB.
  *  - `graft.GraftExtensions` — registers the codegen'd SQL functions
  *    (graft_dot, graft_overlap, graft_topk) queries assume exist.
  *
  * New tools must start here and add only deployment-specific knobs
  * (master/parallelism/broadcast budget) — building a raw
  * `SparkSession.builder()` instead is how one of the three flags gets
  * forgotten (this helper exists because a doc note alone only guards
  * humans who read it).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE re-optimize CACHED plan materialization too (default
      // false): cache materialization otherwise runs its exchanges at
      // the literal shuffle-partition conf with no coalescing, so every
      // iterative loop that caches its per-round frame (connected
      // components, pagerank, textrank) ran near-empty full-width
      // stages per round. Result-identical — only the cached layout's
      // partition count changes; the explicit repartition(n, key) pins
      // (sizedKeyedCache slim layouts, loop edge caches) carry an
      // explicit count and are never AQE-coalesced. Measured (r19):
      // graph_knn_components −30-39%, total −7% over the six
      // loop-bound queries, at both A/B pairs.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
}
