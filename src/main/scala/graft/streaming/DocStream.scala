package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/** Streaming document-ingest operators (north star — the reference is
  * strictly batch, SURVEY.md §2.5). Same harness contract as
  * [[EventStream]]: file-stream source over the static parquet, memory
  * sink + `processAllAvailable` drain for the oracle gate only.
  */
object DocStream {

  private val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming exact dedup on continuous ingest: the content
    * fingerprint (same md5-of-normalized-text as [[graft.operators.Dedup.exact]])
    * is deduplicated in the state store with `dropDuplicates`, so each
    * distinct content is emitted exactly once no matter how often — or
    * in which micro-batch — duplicates arrive. The emitted set is
    * order-independent (the fingerprints themselves), so the result is
    * deterministic even though file-stream arrival order is not.
    *
    * State note: unbounded `dropDuplicates` keeps one state row per
    * distinct fingerprint forever — right for a bounded backfill like
    * this gate; a production ingest with event time would use
    * `dropDuplicatesWithinWatermark` to cap state, trading global
    * uniqueness for a dedup horizon.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val fps = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet") // file source needs a dir
      .parquet(dir)
      .select(md5(TextAnalysis.normalizedText(col("text"))).as("fp"))
      .dropDuplicates("fp")
    val name = "stream_dedup_out"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8") // state stores sized to keys, see EventStream
    try {
      val q = fps.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("fp")
  }

  val QualityThreshold = 0.5

  /** Streaming quality gate on continuous ingest: the same closed-form
    * score as [[graft.operators.TextAnalysis.qualityScore]] (shared
    * expression — batch and stream are bit-identical), filtered at
    * [[QualityThreshold]]. STATELESS — no aggregation, no watermark, no
    * state store: the scoring and filter run inside each micro-batch's
    * scan projection, so at production scale this is a pure pass-through
    * transform whose throughput equals the source's. This is the shape
    * of most pipeline pre-filters (quality, language, length): they
    * belong on the ingest stream, not in a later batch pass over
    * already-stored garbage.
    */
  def streamQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val (lenScore, diversity, stopScore) = TextAnalysis.qualityParts(col("toks"))
    val scored = spark.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .select(col("doc_id"), toks.as("toks")) // materialize tokens once (no CSE)
      .select(col("doc_id"),
        round((lenScore + diversity + stopScore) / lit(3.0), 4).as("quality"))
      .filter(col("quality") >= QualityThreshold)
    val name = "stream_quality_out"
    val q = scored.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("doc_id")
  }
}
