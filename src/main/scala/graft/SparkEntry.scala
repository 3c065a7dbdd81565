package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (or a
  * north-star extension operator); [[oracleSql]] holds DuckDB-equivalent
  * ANSI SQL for the driver's differential check. Column names and value
  * canonicalization (decimal-exact sums, rounding, sorted arrays) are
  * kept identical on both sides — FIXTURES.md §3.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference apps (SURVEY.md §2.4), DataFrame-native formulations
    "wc" -> TextAnalysis.wordCount _,
    "inverted_index" -> TextAnalysis.invertedIndex _,
    // Reference apps on the generic typed mapf/reducef surface (§2.3)
    "mr_wc" -> MRApps.wc _,
    "mr_indexer" -> MRApps.indexer _,
    "mr_crash_shape" -> MRApps.crashShape _,
    // Relational breadth (SURVEY.md §7.1 step 4)
    "q1_pricing_summary" -> Relational.q1PricingSummary _,
    "q3_shipping_priority" -> Relational.q3ShippingPriority _,
    "q5_local_supplier" -> Relational.q5LocalSupplier _,
    "top_orders" -> Relational.topOrders _,
    "top_orders_per_customer" -> Relational.topOrdersPerCustomer _,
    "rollup_orders" -> Relational.rollupOrders _,
    "customers_without_big_orders" -> Relational.customersWithoutBigOrders _,
    "customer_only_nations" -> Relational.customerOnlyNations _,
    "above_avg_balance" -> Relational.aboveAvgBalance _,
    // Event analytics
    "events_hourly" -> Events.hourlyRollup _,
    "events_json" -> Events.jsonExtract _,
    "events_sessionize" -> Events.sessionize _,
    "events_user_profile" -> Events.userProfile _,
    // Text analysis (north star)
    "token_stats" -> TextAnalysis.tokenStats _,
    "quality_score" -> TextAnalysis.qualityScore _,
    "lang_id" -> TextAnalysis.languageId _,
    "doc_fingerprint" -> TextAnalysis.fingerprint _,
  )

  // -- oracle SQL ----------------------------------------------------------
  // Shared fragments so Spark + DuckDB stay in lockstep.

  /** words(tbl): one row per letter-run token, like TextAnalysis.tokens. */
  private val wordsSub =
    """SELECT CAST(doc_id AS VARCHAR) AS doc,
      |       unnest(regexp_split_to_array(text, '[^\p{L}]+')) AS word
      |FROM documents""".stripMargin

  private val revenueExpr =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"

  def oracleSql: Map[String, String] = Map(
    "wc" ->
      s"""SELECT word, count(*) AS cnt FROM ($wordsSub)
         |WHERE length(word) > 0 GROUP BY word ORDER BY word""".stripMargin,
    "inverted_index" ->
      s"""SELECT word,
         |  CAST(count(*) AS VARCHAR) || ' ' || string_agg(doc, ',' ORDER BY doc) AS postings
         |FROM (SELECT DISTINCT doc, word FROM ($wordsSub) WHERE length(word) > 0)
         |GROUP BY word ORDER BY word""".stripMargin,
    "mr_wc" ->
      s"""SELECT word AS key, CAST(count(*) AS VARCHAR) AS value FROM ($wordsSub)
         |WHERE length(word) > 0 GROUP BY word ORDER BY key""".stripMargin,
    "mr_indexer" ->
      s"""SELECT word AS key,
         |  CAST(count(*) AS VARCHAR) || ' ' || string_agg(doc, ',' ORDER BY doc) AS value
         |FROM (SELECT DISTINCT doc, word FROM ($wordsSub) WHERE length(word) > 0)
         |GROUP BY word ORDER BY key""".stripMargin,
    "mr_crash_shape" ->
      """WITH kv AS (
        |  SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
        |  UNION ALL
        |  SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT 'd', 'xyzzy' FROM documents)
        |SELECT key, string_agg(value, ' ' ORDER BY value) AS value
        |FROM kv GROUP BY key ORDER BY key""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($revenueExpr) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($revenueExpr * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
         |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(sum($revenueExpr) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT n_name, CAST(sum($revenueExpr) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "top_orders_per_customer" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, rk FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "customers_without_big_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "customer_only_nations" ->
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_nationkey IN (
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 9000.0
        |  EXCEPT
        |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000.0)
        |ORDER BY n_nationkey""".stripMargin,
    "above_avg_balance" ->
      """SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
        |FROM customer c
        |JOIN (SELECT c_nationkey AS nk,
        |        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS nat_avg
        |      FROM customer GROUP BY c_nationkey) a ON c.c_nationkey = a.nk
        |WHERE c.c_acctbal > a.nat_avg
        |ORDER BY c_custkey""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "events_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
    "events_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "events_user_profile" ->
      """SELECT user_id, count(*) AS n_events,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
        |           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value,
        |  min(ts) AS first_seen, max(ts) AS last_seen
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "token_stats" ->
      """SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  round(CAST(coalesce(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE)
        |        / greatest(len(toks), 1), 4) AS avg_token_len,
        |  n_chars
        |FROM (SELECT doc_id, n_chars,
        |        list_filter(regexp_split_to_array(text, '[^\p{L}]+'), w -> length(w) > 0) AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
  ) ++ qualityLangOracles

  /** quality_score + lang_id oracles are built programmatically so the
    * marker lists / weights live in exactly one place (TextAnalysis).
    */
  private def qualityLangOracles: Map[String, String] = {
    val toks = "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), w -> length(w) > 0)"
    val toksLower = "list_filter(regexp_split_to_array(lower(text), '[^\\p{L}]+'), w -> length(w) > 0)"
    val stopList = TextAnalysis.StopwordsEn.map(w => s"'$w'").mkString("[", ", ", "]")
    val quality =
      s"""WITH t AS (
         |  SELECT doc_id, $toks AS toks FROM documents),
         |s AS (
         |  SELECT doc_id,
         |    CAST(len(toks) AS DOUBLE) AS n_tok,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) AS n_dist,
         |    CAST(len(list_filter(toks, w -> list_contains($stopList, w))) AS DOUBLE) AS n_stop
         |  FROM t)
         |SELECT doc_id,
         |  round(least(n_tok / 50.0, 1.0), 4) AS len_score,
         |  round(n_dist / greatest(n_tok, 1.0), 4) AS diversity,
         |  round(least(n_stop / greatest(n_tok, 1.0) * 5.0, 1.0), 4) AS stop_score,
         |  round((least(n_tok / 50.0, 1.0) + n_dist / greatest(n_tok, 1.0)
         |         + least(n_stop / greatest(n_tok, 1.0) * 5.0, 1.0)) / 3.0, 4) AS quality
         |FROM s ORDER BY doc_id""".stripMargin
    val langs = TextAnalysis.LangMarkers
    val scoreCols = langs.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, w -> list_contains($lst, w))) AS score_$lang"
    }.mkString(",\n    ")
    val names = langs.map(_._1)
    val whenChain = names.map { lang =>
      val isMax = names.filter(_ != lang).map(o => s"score_$lang >= score_$o").mkString(" AND ")
      s"WHEN score_$lang > 0 AND $isMax THEN '$lang'"
    }.mkString("\n    ")
    val langId =
      s"""WITH t AS (
         |  SELECT doc_id, lang AS lang_true, $toksLower AS toks FROM documents),
         |s AS (
         |  SELECT doc_id, lang_true,
         |    $scoreCols
         |  FROM t)
         |SELECT doc_id, lang_true,
         |  CASE
         |    $whenChain
         |    ELSE 'und' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin
    Map("quality_score" -> quality, "lang_id" -> langId)
  }
}
