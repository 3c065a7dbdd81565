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

  /** Width of [[sessionize]]'s time chunks (1 day in µs). Any width
    * ≥ the session gap works — with W ≥ gap, a user chunk can only
    * stitch to the IMMEDIATELY preceding chunk (an empty chunk between
    * two events forces a silence > W ≥ gap, i.e. a session break), so
    * the boundary correction is a lag-1 over the chunk aggregate,
    * never a search.
    */
  private[graft] val SessionChunkUs = 24L * 3600 * 1000000

  /** The (user, day)-chunk id with the chunked paths' NON-NULL input
    * contract enforced at the operator: [[sessionizeOf]] and
    * [[asofLastPurchaseOf]] join their chunk aggregates back on plain
    * (user_id, chunk) equi-keys — deliberately, so the join
    * co-partitions with the chunk windows (a null-safe `<=>` join
    * plans on coalesce-wrapped keys and mispartitions the downstream
    * window) — at the price that a null `user_id` or `ts` row would
    * SILENTLY VANISH where the single-window form kept it in its null
    * partition. Raising beats routing nulls through a
    * single-window side path: null-ts rows interleave with a user's
    * non-null rows in the window form's ordering (nulls sort first),
    * so a split-and-union is NOT bit-identical for a user with mixed
    * null/non-null timestamps — a loud per-row error is honest where
    * that union would be silently different. The branch is two
    * codegen'd null checks per row; `raise_error` is unreachable on
    * the (spec-pinned non-null) events table.
    *
    * The `rand(42) * 0` term is an OPTIMIZER BARRIER, not noise: the
    * chunk equi-join makes Catalyst infer `isNotNull(user_id)` /
    * `isNotNull(chunk)` constraints and push them to the SCAN — below
    * this projection — so a deterministic guard never sees the null
    * row it exists to catch (the filter prunes it first and the drop
    * is silent again; the guard spec caught exactly this). A
    * nondeterministic expression in the project list legally blocks
    * predicate pushdown through it, so the inferred filters stay
    * above and every input row reaches the guard. Value-wise the term
    * is exactly 0 (and per-partition-seeded, so task retries agree);
    * cost is one xorshift per row; no other predicate wants to cross
    * this projection in either caller (asof's event_type filter sits
    * above a window it cannot cross anyway).
    */
  private def guardedChunk: org.apache.spark.sql.Column =
    when(col("user_id").isNotNull && col("ts").isNotNull,
      expr(s"unix_micros(ts) div $SessionChunkUs") + (rand(42) * 0).cast("long"))
      .otherwise(raise_error(lit(
        "graft.Events: null user_id/ts event reached the time-chunked path; " +
        "the chunk equi-join would silently drop it - filter or repair nulls upstream")))

  /** Sessionization: a session breaks after a 30-minute silence per
    * user. Classic gaps-and-islands (`lag` + running sum), but NOT as
    * the classic single per-user window — a bot user would funnel its
    * entire history through one task. Time-chunked with boundary
    * stitching instead, semantics unchanged:
    *
    *  1. within each (user, day-chunk): the usual lag/flag/running-sum,
    *     a window whose partition holds one user-DAY of events;
    *  2. per-(user, chunk) aggregate: first/last ts + session-start
    *     count — calendar-bounded rows per user;
    *  3. the stitch: chunk c continues chunk c−1's last session iff
    *     they are adjacent and the boundary silence ≤ gap (chunks are
    *     wider than the gap, so non-adjacent chunks can never stitch —
    *     see [[SessionChunkUs]]); a lag-1 + prefix sum over the chunk
    *     aggregate turns corrected start-counts into each chunk's
    *     session-id offset;
    *  4. global session_seq = chunk offset + within-chunk running sum
    *     with the chunk-first flag flipped off when stitched — exactly
    *     the running sum the single window computes, reassembled from
    *     per-chunk pieces (chunk is a monotone function of ts, so
    *     chunk order refines (ts, event_id) order; the boundary
    *     predecessor's ts is the previous chunk's max ts).
    *
    * The oracle keeps the plain single-window SQL; the differential is
    * the equivalence proof. The streaming analogue with
    * `flatMapGroupsWithState` is in [[graft.streaming.EventStream]].
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeOf(Tables.events(spark, dir))

  /** Core of [[sessionize]] over any events-shaped frame (event_id,
    * user_id, ts, value) — split out so the chunk-boundary stitch is
    * unit-testable on synthetic rows (stitch within gap, break beyond
    * it, break across an empty chunk, multi-chunk session chains).
    */
  private[graft] def sessionizeOf(events: DataFrame): DataFrame = {
    val gapMicros = 30L * 60 * 1000000 // compare in µs: exact in both engines
    val wChunk = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    val flagged = events
      .withColumn("chunk", guardedChunk)
      .withColumn("prev_ts", lag(col("ts"), 1).over(wChunk))
      .withColumn("new_in",
        (col("prev_ts").isNull ||
         unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros)
          .cast("long"))
    // the chunk aggregate feeds ONE consumer (the join back), so it
    // stays lazy — unlike ordersPercentileRank's twice-referenced
    // count frame there is nothing to checkpoint against, and the
    // measured A/B put the eager-materialized form behind the plain
    // plan (the corpus runs through the (user, chunk) window twice
    // either way; Catalyst does not reuse the exchange here)
    val wUser = Window.partitionBy("user_id").orderBy("chunk")
    val adj =
      flagged.groupBy("user_id", "chunk")
        .agg(min("ts").as("first_ts"), max("ts").as("last_ts"),
             sum("new_in").as("starts"))
        .withColumn("cont",
          when(lag("chunk", 1).over(wUser) === col("chunk") - 1 &&
               unix_micros(col("first_ts")) -
                 unix_micros(lag("last_ts", 1).over(wUser)) <= gapMicros,
            lit(1L)).otherwise(lit(0L)))
        .withColumn("offset", coalesce(
          sum(col("starts") - col("cont")).over(
            wUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("user_id"), col("chunk"), col("cont"), col("offset"))
    // plain equi-join, deliberately: it co-partitions with the chunk
    // windows on the raw (user_id, chunk) keys, so at scale the SMJ
    // rides the window exchange with no extra corpus shuffle (a
    // null-safe <=> join plans on coalesce-wrapped keys,
    // mispartitioning the downstream window once the aggregate side
    // outgrows a broadcast). The non-null input contract this rests
    // on is ENFORCED by [[guardedChunk]] above — a null-keyed row
    // raises on first touch instead of silently dropping here — and
    // additionally canary-pinned on the events table.
    flagged.join(adj, Seq("user_id", "chunk"))
      .withColumn("new_corr",
        when(col("prev_ts").isNull, lit(1L) - col("cont")).otherwise(col("new_in")))
      .withColumn("session_seq", col("offset") + sum("new_corr").over(
        wChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
           min("ts").as("session_start"),
           max("ts").as("session_end"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .orderBy("user_id", "session_seq")
  }

  /** As-of join, composed from built-ins (preference (a) in the
    * custom-operator ladder): for each error event, the most recent
    * preceding purchase by the same user. Implemented as the
    * sort-merge-friendly carry-forward formulation — tag the purchase
    * row, `last(_, ignoreNulls)` over a running window — with the same
    * time-chunk split as [[sessionize]] so no bot user can funnel its
    * whole history through one window task:
    *
    *  1. within each (user, day-chunk): carry the last purchase ROW
    *     (one struct-valued `last ignoreNulls`, so id/ts/value always
    *     travel together — the oracle's ASOF contract is row-wise);
    *  2. per-(user, chunk) aggregate: the chunk's last purchase via
    *     `max_by` (null ordering for non-purchases, so purchase-free
    *     chunks aggregate to null) — calendar-bounded rows per user;
    *  3. carry-in: a strictly-preceding `last ignoreNulls` over the
    *     chunk aggregate hands each chunk the latest purchase from any
    *     EARLIER chunk (unlike the sessionize stitch this legally
    *     reaches across empty chunks — carry-forward has no gap);
    *  4. an event's as-of purchase = within-chunk carry, else the
    *     chunk's carry-in. Chunk is a monotone function of ts, so the
    *     composition equals the single-window form exactly.
    *
    * Tie handling: the oracle's ASOF contract is `e.ts >= p.ts`, so a
    * purchase sharing an error's exact timestamp must be visible to
    * that error regardless of event_id order. The within-chunk window
    * therefore sorts purchases BEFORE non-purchases at equal ts (then
    * event_id) — equal timestamps share a chunk, so the boundary never
    * sees a tie — making the equivalence hold by construction instead
    * of relying on the data's per-user ts uniqueness (which
    * OperatorsSpec asserts separately as a canary). The oracle keeps
    * the plain ASOF SQL; a synthetic spec proves the chunked
    * differential across boundaries and empty chunks.
    */
  def asofLastPurchase(spark: SparkSession, dir: String): DataFrame =
    asofLastPurchaseOf(Tables.events(spark, dir))

  /** Core of [[asofLastPurchase]] over any events-shaped frame
    * (event_id, user_id, ts, event_type, value) — split out so the tie
    * and chunk-boundary semantics are unit-testable on synthetic rows.
    */
  def asofLastPurchaseOf(events: DataFrame): DataFrame = {
    val isPurchase = col("event_type") === "purchase"
    val pRow = when(isPurchase, struct(col("ts").as("p_ts"),
      col("event_id").as("p_id"), col("value").as("p_value")))
    val e = events.withColumn("chunk", guardedChunk)
    // per-chunk last purchase; purchase-free chunks aggregate to null
    // (max_by skips rows whose ordering is null). Lazy like
    // sessionize's chunk aggregate — one consumer, measured ~35%
    // faster than the eager-checkpointed form at sf0.1.
    val wUser = Window.partitionBy("user_id").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn =
      e.groupBy("user_id", "chunk")
        .agg(max_by(pRow, when(isPurchase,
          struct(col("ts"), col("event_id")))).as("lp"))
        .withColumn("cin", last("lp", ignoreNulls = true).over(wUser))
        .select(col("user_id"), col("chunk"), col("cin"))
    val wChunk = Window.partitionBy("user_id", "chunk")
      .orderBy(col("ts"), when(isPurchase, 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // plain equi-join — same co-partitioning argument as sessionize's
    // join above; the non-null input contract is ENFORCED by
    // [[guardedChunk]] (null-keyed rows raise, never silently drop)
    e.join(carryIn, Seq("user_id", "chunk"))
      .withColumn("lastp",
        coalesce(last(pRow, ignoreNulls = true).over(wChunk), col("cin")))
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
              col("ts").as("error_ts"),
              col("lastp.p_id").as("last_purchase_id"),
              col("lastp.p_ts").as("last_purchase_ts"),
              col("lastp.p_value").as("last_purchase_value"))
      .orderBy("error_id")
  }

  val QuantilePoints: Seq[Double] = Seq(0.5, 0.9, 0.99)

  /** Exact per-type value quantiles (p50/p90/p99, linear interpolation —
    * the R-7 definition Spark's `percentile` and DuckDB's
    * `quantile_cont` share). All points come from ONE `percentile(value,
    * array(...))` aggregate — one shared per-group value buffer, not one
    * per point. Exact quantiles buffer each group's values in the
    * aggregation state: right for the oracle gate and fine while
    * |group| fits an executor, but at 100 TB the production form is
    * `approx_percentile` (t-digest-style mergeable sketch, bounded
    * state, rank error ≤ the accuracy parameter) — the query shape is
    * identical, only the aggregate swaps.
    */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val pts = QuantilePoints.mkString(", ")
    val qcols = QuantilePoints.zipWithIndex.map { case (p, i) =>
      round(element_at(col("qs"), i + 1), 4).as(s"p${(p * 100).toInt}")
    }
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        expr(s"percentile(value, array($pts))").as("qs"))
      .select(Seq(col("event_type"), col("n_events")) ++ qcols: _*)
      .orderBy("event_type")
  }

  /** GK rank-error parameter for [[valueQuantilesApprox]]: guaranteed
    * rank error ≤ n / accuracy per group.
    */
  val ApproxAccuracy = 10000

  /** The PRODUCTION form [[valueQuantiles]]'s docstring names, shipped
    * and benchmarked: `percentile_approx` (Greenwald–Khanna sketch,
    * bounded mergeable state ~O(accuracy·log n) per group) replacing
    * exact `percentile`'s full per-group value buffer — the swap a
    * 100 TB deployment makes.
    *
    * DuckDB's approx_quantile is a t-digest — a different sketch with
    * different estimates, so the raw GK values can never cross-engine
    * hash-match. What IS deterministic is GK's CONTRACT: every returned
    * value's rank sits within n/accuracy of the target rank. So the
    * query verifies its own estimates — each estimate's exact rank
    * interval [#(value < est)+1, #(value ≤ est)] (one broadcast join of
    * the |types|·|points| estimate rows back against the corpus, one
    * combiner aggregate) must intersect [p·n − bound, p·n + bound] with
    * bound = 2·⌈n/accuracy⌉ + 2 (2× the single-sketch guarantee —
    * partial sketches merge across partitions and merge error
    * composes) — and emits the per-point verdicts, which the oracle
    * pins to all-1s. A sketch regression (wrong estimates,
    * broken merge) flips a verdict and fails the hash gate, closing the
    * hole that made this the one rows-only-checked query.
    */
  def valueQuantilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val pts = QuantilePoints.mkString(", ")
    val k = QuantilePoints.length
    val ev = Tables.events(spark, dir).select("event_type", "value")
    val est = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        expr(s"percentile_approx(value, array($pts), $ApproxAccuracy)").as("qs"))
    val probes = est
      .select(col("event_type"), col("n_events"),
        explode(sequence(lit(1), lit(k))).as("i"), col("qs"))
      .select(col("event_type"), col("n_events"), col("i"),
        element_at(lit(QuantilePoints.toArray), col("i")).as("p"),
        element_at(col("qs"), col("i")).as("est"))
    val ranked = ev.join(broadcast(probes), "event_type")
      .groupBy("event_type", "n_events", "i", "p", "est")
      .agg(sum(when(col("value") < col("est"), 1L).otherwise(0L)).as("r_lt"),
           sum(when(col("value") <= col("est"), 1L).otherwise(0L)).as("r_le"),
           // GK sketches only non-null values; rank targets must use
           // that n, not count(*), or a null-bearing column would shift
           // the window off the estimate's true rank
           count(col("value")).as("n_vals"))
    val target = col("p") * col("n_vals")
    // 2× the single-sketch ε·n guarantee: partial sketches merge across
    // partitions and merge error composes — the documented bound holds
    // per sketch, not per merge tree. Doubling keeps the gate green
    // under any partitioning while still failing on gross estimator
    // regressions (a broken merge or wrong estimate is off by >> 2εn).
    val bound = lit(2) * ceil(col("n_vals").cast("double") / ApproxAccuracy) + lit(2)
    // a group with ZERO non-null values has no estimate to verify (GK
    // returns NULL, and NULL-vs-rank comparisons would yield verdict 0
    // against the oracle's pinned 1): the sketch contract is vacuously
    // met, so the degenerate group passes instead of failing spuriously
    val ok = when(col("n_vals") === 0L, 1L)
      .when(col("r_le") >= target - bound && col("r_lt") + 1 <= target + bound, 1L)
      .otherwise(0L)
    val okCols = QuantilePoints.zipWithIndex.map { case (p, idx) =>
      max(when(col("i") === idx + 1, ok)).as(s"p${(p * 100).toInt}_ok")
    }
    ranked
      .groupBy("event_type", "n_events")
      .agg(okCols.head, okCols.tail: _*)
      .orderBy("event_type")
  }

  /** Ordered conversion funnel view → click → purchase: a user counts
    * at a stage only if the stage event happens AT OR AFTER their entry
    * to the previous stage (min-timestamp semantics, the standard
    * product-analytics funnel). Three aggregation passes, all keyed on
    * user_id — at scale they co-partition, so after the first exchange
    * the later stages reuse the partitioning (AQE) rather than
    * reshuffling the corpus.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val view = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val click = ev.filter(col("event_type") === "click")
      .join(view, "user_id")
      .filter(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(click, "user_id")
      .filter(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_purchase"))
    def stageCount(df: DataFrame, stage: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), col("n_users"))
    stageCount(view, "1_view")
      .union(stageCount(click, "2_click"))
      .union(stageCount(purchase, "3_purchase"))
      .orderBy("stage")
  }

  /** Day-offset retention cohorts: users are grouped by their first-
    * seen day; each (cohort, day offset) cell counts the distinct users
    * active that day. Days are EPOCH days (`unix_micros div 86 400e6`),
    * not `date_trunc('day')` — date_trunc follows the session timezone,
    * and under a DST zone a 23-hour day would make the µs difference a
    * non-multiple of a day and shift offsets; epoch-day integer
    * arithmetic is timezone-independent and matches the oracle's naive
    * timestamps exactly. Three hash exchanges: first-seen per user, the
    * per-day distinct, and the cohort-cell aggregate (plus the output
    * sort) — the distinct dominates at scale and partial-aggregates
    * before shuffling.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val usPerDay = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $usPerDay").as("day"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(first, "user_id")
      .select(timestamp_micros(col("cohort_day") * usPerDay).as("cohort"),
        (col("day") - col("cohort_day")).as("day_n"),
        col("user_id"))
      .distinct()
      .groupBy("cohort", "day_n")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "day_n")
  }

  /** Range join: for each error event, count + total value of the same
    * user's events in the 5 minutes strictly before the error. The join
    * is an EQUI-join on user_id with the time band as a residual
    * predicate — so it plans as one hash/sort-merge exchange per side
    * keyed on user_id (asserted in PlanAuditSpec), never an interval
    * cross join: per-user event streams are the bounded unit of work,
    * which is exactly how the shape survives 100 TB (hot users are the
    * skew risk; [[Skew.saltedJoin]] is the mitigation lever). Time
    * arithmetic is µs-integer, timezone-free on both engines.
    */
  def errorContext(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("e_us"),
              col("event_id").as("prior_id"), col("value"))
    val errors = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
              unix_micros(col("ts")).as("r_us"))
    val windowUs = 5L * 60 * 1000000
    errors.join(ev,
        errors("user_id") === ev("user_id") &&
          col("e_us") >= col("r_us") - windowUs && col("e_us") < col("r_us"),
        "left")
      .groupBy("error_id")
      .agg(count(col("prior_id")).as("n_prior"),
           coalesce(sum(col("value").cast("decimal(18,2)")),
                    lit(0).cast("decimal(18,2)")).cast("double").as("prior_value"))
      .orderBy("error_id")
  }

  /** Daily event counts per type with a TRUE 3-calendar-day trailing
    * moving average: the per-type day grid is gap-filled (zero-count
    * days materialized from each type's [min, max] day span) before the
    * 3-row window, so the window always spans exactly three days — a
    * rows-window over observed days alone would silently stretch across
    * gaps. Days are EPOCH days (µs-integer, timezone-free, same
    * convention as [[retention]]); the expensive pass is the day×type
    * aggregate (partial-agg'd, shuffle is |days × types|), and the grid
    * + window run over that tiny frame.
    */
  def movingAvgDaily(spark: SparkSession, dir: String): DataFrame = {
    val usPerDay = 86400000000L
    val daily = Tables.events(spark, dir)
      .groupBy(expr(s"unix_micros(ts) div $usPerDay").as("day_n"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val grid = daily.groupBy("event_type")
      .agg(min("day_n").as("mn"), max("day_n").as("mx"))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("day_n"))
    val w = Window.partitionBy("event_type").orderBy("day_n").rowsBetween(-2, 0)
    grid.join(daily, Seq("event_type", "day_n"), "left")
      .select(col("event_type"), col("day_n"), coalesce(col("n"), lit(0L)).as("n_events"))
      .withColumn("ma3", round(avg(col("n_events")).over(w), 4))
      .select(timestamp_micros(col("day_n") * usPerDay).as("day"),
              col("event_type"), col("n_events"), col("ma3"))
      .orderBy("event_type", "day")
  }

  /** Per-user event-type profile as a SORTED "type:count" string — the
    * collect-then-serialize aggregation shape (type domain is small and
    * bounded, so the collected list is too). Two combiner-friendly
    * aggregates, both keyed on user_id after the first — the second
    * reuses the partitioning. The list sorts before serializing, so the
    * output is independent of arrival/partition order.
    */
  def typeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(sum("n").as("n_events"),
        array_join(
          transform(sort_array(collect_list(struct(col("event_type"), col("n")))),
            x => concat(x("event_type"), lit(":"), x("n").cast("string"))),
          ",").as("type_counts"))
      .orderBy("user_id")

  val ResampleBucketUs: Long = 6L * 3600 * 1000000

  /** Time-series resampling with gap fill: each user's events land on a
    * 6-hour grid from their first to their last bucket; empty buckets
    * get a zero count and CARRY FORWARD the user's latest value — the
    * standard regularization step before windowed feature extraction.
    *
    * Shape: one combiner-friendly (user, bucket) aggregate, the grid
    * exploded from each user's [min, max] bucket pair (grid rows ≪
    * events — never a time×users cartesian), a per-user equi-join, and
    * one carry-forward window partitioned by user. Everything keys on
    * user_id, so after the first exchange the join and window reuse the
    * partitioning. `max_by(value, ts)` picks each bucket's latest value
    * (per-user ts uniqueness is a spec-pinned canary); bucket ids are
    * µs-integer, timezone-free.
    */
  def resample(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $ResampleBucketUs").as("b"),
        col("ts"), col("value").cast("decimal(18,2)").as("vd"))
    val perBucket = e.groupBy("user_id", "b")
      .agg(count(lit(1)).as("n"), expr("max_by(vd, ts)").cast("double").as("lastv"))
    val grid = e.groupBy("user_id")
      .agg(min("b").as("mn"), max("b").as("mx"))
      .select(col("user_id"), explode(sequence(col("mn"), col("mx"))).as("b"))
    val carry = Window.partitionBy("user_id").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("user_id", "b"), "left")
      .select(col("user_id"), col("b"), coalesce(col("n"), lit(0L)).as("n_events"),
              col("lastv"))
      .withColumn("filled_value", last("lastv", ignoreNulls = true).over(carry))
      .select(col("user_id"),
        timestamp_micros(col("b") * ResampleBucketUs).as("bucket_start"),
        col("n_events"), col("filled_value"))
      .orderBy("user_id", "bucket_start")
  }

  /** `events_ohlc`: open/high/low/close candles per (event_type, hour)
    * — the canonical downsampling of a value stream for charting and
    * feature windows. Every component is a PARTIAL-AGGREGABLE monoid:
    * count, min, max, and first/last via `min_by`/`max_by` over a
    * fixed-width (epoch_us, event_id) string key (a composite that
    * makes first/last deterministic even when two users share a
    * timestamp inside a bucket — lexicographic on the padded string
    * equals numeric on the pair). One combiner-friendly shuffle to
    * |types|·|hours| rows; no window, no per-group materialization —
    * the contrast to `events_quantiles`, whose exact percentiles
    * cannot partial-aggregate. open/close are PICKED values and
    * min/max touch single elements, so no accumulation-order concern
    * exists and doubles cross engines bit-exactly.
    */
  def ohlcResample(spark: SparkSession, dir: String): DataFrame = {
    val ord = concat(
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lpad(col("event_id").cast("string"), 12, "0"))
    Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        col("value"), ord.as("ord"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n_events"),
        expr("min_by(value, ord)").as("open"),
        max("value").as("high"),
        min("value").as("low"),
        expr("max_by(value, ord)").as("close"))
      .orderBy("event_type", "hour")
  }

  /** Per-type value outliers at |z| > 3. The moments come from EXACT
    * decimal sums (Σx, Σx² as DECIMAL — double accumulation would make
    * mean/variance depend on partition order, i.e. differ run-to-run
    * and engine-to-engine; exact sums also kill the catastrophic-
    * cancellation worry in the Σx² − (Σx)²/n form, since nothing is
    * lost before the one double subtraction). One combiner-friendly
    * stats aggregate (|types| rows, broadcast back), one map-side scan
    * for the z filter — the corpus never shuffles. The filter uses the
    * UNROUNDED z (identical doubles on both engines); only the output
    * rounds.
    */
  def valueAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
              col("value").cast("decimal(18,2)").as("xd"))
    val stats = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("xd")).cast("double").as("sx"),
      sum(col("xd") * col("xd")).cast("double").as("sxx"))
    val x = col("xd").cast("double")
    // n > 1 AND variance > 0 excludes single-row, constant, and
    // NEAR-constant types: their z is a 0/0 (or sqrt-of-negative-ulp)
    // where the engines genuinely diverge — Spark double division
    // gives NaN, and NaN compares GREATER in Spark's ordering (so both
    // `sd > 0` and `abs(z) > 3` would be true for garbage), while
    // DuckDB returns NULL for 0/0 and ERRORS on sqrt of a negative.
    // Guarding the VARIANCE (always a finite double) rather than sd
    // keeps NaN out of the guard itself; the oracle pre-filters groups
    // in a CTE so DuckDB never evaluates sqrt on a negative.
    val variance = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
    val z = (x - col("sx") / col("n")) / sqrt(variance)
    e.join(broadcast(stats), "event_type")
      .filter(col("n") > 1 && variance > 0 && abs(z) > 3)
      .select(col("event_id"), col("event_type"), x.as("value"),
              round(z, 4).as("z"))
      .orderBy("event_id")
  }

  /** SLIDING-window counts (2-hour windows every hour): each event
    * lands in exactly two windows, declared with Spark's
    * `window(ts, windowDuration, slideDuration)` — the engine expands
    * the slide assignments inline (an Expand of windows/slide rows per
    * event, here 2×) and the aggregate stays one combiner-friendly
    * shuffle of |windows × types| partials. Complements the tumbling
    * windows everywhere else; window starts surface as plain
    * timestamps for the oracle.
    */
  def slidingWindowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n_events"))
      .orderBy("w_start", "event_type")

  /** Hour-of-day × day-of-week activity heatmap — the usage-pattern
    * staple. Both coordinates come from INTEGER epoch-µs arithmetic
    * (`dow`: epoch day 0 = Thursday 1970-01-01, so `(day + 4) % 7`
    * makes 0 = Sunday), never from calendar functions whose week-start
    * and timezone conventions differ across engines. One
    * combiner-friendly aggregate to a 168-row result.
    */
  def activityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val usPerDay = 86400000000L
    Tables.events(spark, dir)
      .select(
        expr(s"(unix_micros(ts) div $usPerDay + 4) % 7").as("dow"),
        expr(s"(unix_micros(ts) % $usPerDay) div 3600000000").as("hour"),
        col("value"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy("dow", "hour")
  }

  /** `events_nearby`: for each error event, how many events the same
    * user produced within ±[[NearbyWindowMicros]] (5 minutes) — the
    * "activity around an anchor" range join that backs blast-radius
    * and co-occurrence features.
    *
    * The naive formulation is a per-user INEQUALITY join (`|Δts| ≤ w`)
    * — Spark plans that as a per-user nested loop, quadratic in the
    * busiest user's event count, and a whale user makes it a
    * scale-killer. Banded instead: both sides bucket `ts` into
    * window-width bands with INTEGER `div` (double division could
    * misround at band edges), the anchor side expands to its 3
    * adjacent bands (`explode` of a 3-element array — anchors are the
    * rare side, so the 3× blowup is on the small input), and the join
    * is a pure EQUI-join on (user_id, band) that hash-partitions and
    * never nest-loops. A candidate event lives in exactly one band, so
    * each true neighbor is matched exactly once — no post-dedup. The
    * exact `|Δus| ≤ w` predicate rides the join condition as a
    * residual filter. Self-matches are kept in the join (every anchor
    * matches itself, so no zero-group vanishes) and subtracted from
    * the count. `PlanAuditSpec` asserts no nested-loop/cartesian
    * operator appears.
    */
  def nearbyEvents(spark: SparkSession, dir: String): DataFrame = {
    val w = NearbyWindowMicros
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")).as("us"))
    val cands = ev.select(col("user_id"),
      expr(s"us div $w").as("band"), col("us").as("n_us"))
    val anchors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("us"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("off"))
      .withColumn("band", expr(s"us div $w") + col("off"))
    anchors.join(cands, Seq("user_id", "band"))
      .filter(abs(col("n_us") - col("us")) <= w)
      .groupBy("user_id", "event_id")
      .agg((count(lit(1)) - 1L).as("n_nearby"))
      .orderBy("user_id", "event_id")
  }

  /** Band width (and neighborhood half-width) for [[nearbyEvents]]. */
  val NearbyWindowMicros: Long = 5L * 60 * 1000000

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
