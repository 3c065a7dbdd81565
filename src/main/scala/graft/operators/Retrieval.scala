package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Full-text retrieval over the `documents` table (north star; the
  * reference has no retrieval operators — its closest surface is the
  * inverted-index app, `mrapps/indexer.go`, which this extends from
  * "who contains the word" to "who best matches the query").
  *
  * Retrieval is a first-class training-data-pipeline operator: ranked
  * lookup of corpus documents for a query set drives decontamination
  * triage (what does the corpus contain that looks like this benchmark
  * item?), targeted quality audits, and retrieval-augmented data
  * selection.
  */
object Retrieval {

  /** Standard BM25 hyperparameters (the Robertson/Lucene defaults). */
  val K1 = 1.2
  val B = 0.75
  val BmTopK = 10

  /** The fixed benchmark query set — literal on BOTH engines, so the
    * oracle replays the exact same lookups.
    */
  val Queries: Seq[(Long, String)] = Seq(
    1L -> "spark stream window",
    2L -> "hash join table",
    3L -> "fast vector scan",
    4L -> "customer order query",
    5L -> "slow batch merge")

  /** `bm25_search`: top-[[BmTopK]] documents per query by BM25.
    *
    * 100 TB shape — the corpus is tokenized and shuffled EXACTLY ONCE,
    * into the (doc, term, tf) posting frame. Document length is free:
    * `size(tokens)` is computed map-side in the same tokenize pass and
    * carried through the tf aggregate as part of the (functionally
    * dependent) group key, so it costs zero extra exchanges. Document
    * frequency is computed AFTER the postings are semi-joined down to
    * the broadcast query-term set — filtering by term drops no postings
    * of a kept term, so the per-term df over the matched frame equals
    * the corpus df, and the window input shrinks from |postings| to
    * |postings of matched terms|. N and the average length are a 1-row
    * broadcast from one map-only re-scan of the text (an extra
    * tokenize pass, but caching the corpus-sized posting frame to save
    * it would pin corpus-scale memory — the [[Corpus.bigramPmi]]
    * trade, decided the same way). The per-query rank window sees
    * only each query's candidate set, never the corpus. In production
    * the posting frame is the thing you materialize (bucketed by term)
    * and this query is a broadcast-probe of it; scores round to 6dp
    * before ranking so the cut never hinges on sub-1e-6 libm
    * differences between engines.
    */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25Search(spark, dir, Queries)

  /** Query-set-parameterized form; scores for a query must not depend on
    * what OTHER queries are in the set (df is a corpus statistic), which
    * `RetrievalSpec` pins by running overlapping query sets.
    */
  def bm25Search(spark: SparkSession, dir: String,
      queries: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // lowercased tokens: queries are lowercase literals, and retrieval
    // must match 'Spark' to 'spark' — the one surface where case-folding
    // matters most (the LM scorers fold for the same reason)
    val tf = docs
      .select(col("doc_id"), TextAnalysis.tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val stats = docs
      .select(size(TextAnalysis.tokens(lower(col("text")))).cast("long").as("n"))
      .agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"))
    val qterms = queries
      .flatMap { case (qid, q) => q.split(" ").map(t => (qid, t)) }
      .toDF("query_id", "term")
    // df FIRST, over a TRUE semi-join: `tf` has one row per (doc, term),
    // so after a leftsemi against the DISTINCT query vocabulary the
    // per-term window count equals the corpus df exactly. Joining the
    // (query_id, term) frame before counting would duplicate each
    // posting row once per query that shares the term, inflating df by
    // that factor — silent idf corruption whenever two queries overlap.
    val matched = tf
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "leftsemi")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    val enriched = matched.join(broadcast(qterms), "term")
    val avgdl = col("total_tokens").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = col("tf").cast("double") * (K1 + 1) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / avgdl))
    // per-term contributions round to 9dp and sum as DECIMAL: the
    // per-term value is a single deterministic expression (identical
    // doubles on both engines), and the decimal sum is order-exact —
    // a double sum's result depends on aggregation order, which Spark
    // does not fix across partitionings
    val scores = enriched
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(idf * tfNorm, 9).cast("decimal(18,9)").as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib").cast("double"), 6).as("score"))
    scores
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rnk") <= BmTopK)
      .orderBy("query_id", "rnk")
  }
}
