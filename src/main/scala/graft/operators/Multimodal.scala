package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed metadata produced by the (stubbed) media decode kernel. */
case class MediaMeta(doc_id: Long, n_bytes: Long, sha: String,
                     width: Long, height: Long, format: String)

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * payloads with typed metadata, processed in per-partition batches.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * STUB — a deterministic function of the payload bytes, clearly marked
  * below. Everything around it is the real production shape:
  * binary columns, `mapPartitions` iterator-to-iterator batch
  * processing (the Scala analogue of `mapInPandas`: one executor-side
  * batch per partition, no driver collect, spill-safe), typed output
  * via case-class Encoders, and partition-count-independent results.
  */
object Multimodal {

  /** Ingestion: payloads as a `binary` column + cheap scan-time
    * metadata. At 100 TB the payload column stays columnar in parquet
    * and is pruned unless a query touches it.
    */
  def ingestBinary(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
              encode(col("text"), "UTF-8").as("payload"),
              col("source"))

  /** STUB decode kernel: a real pipeline would decode image bytes and
    * return (width, height, format). Codecs are unavailable here, so
    * dimensions are a deterministic function of the byte length —
    * the Spark-side plumbing (batching, schema, distribution) is what
    * this operator exercises and tests.
    */
  private[operators] def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val md = MessageDigest.getInstance("SHA-256")
    val sha = md.digest(payload).map("%02x".format(_)).mkString
    val n = payload.length.toLong
    MediaMeta(
      doc_id = docId,
      n_bytes = n,
      sha = sha,
      width = n % 640 + 16,
      height = n % 480 + 16,
      format = (n % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "webp" })
  }

  /** Batch "decode": binary payloads → typed metadata via
    * `mapPartitions` (one iterator per partition; the executor
    * processes a whole batch without materializing it).
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    implicit val enc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
    Kernels.fanOut(
      ingestBinary(spark, dir)
        .select("doc_id", "payload")) // single-file scan -> fan out decode
      .mapPartitions { rows: Iterator[Row] =>
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
      .toDF()
      .orderBy("doc_id")
  }

  val ResizeTarget = 64L

  /** "Resize" planning: given the decoded dimensions, compute the
    * aspect-preserving fit into a [[ResizeTarget]]² box (ceil-scaled,
    * like a thumbnailer) — the metadata half of a resize operator; the
    * pixel work lives in the same stubbed decode kernel. Everything
    * here is exact integer arithmetic, so the DuckDB oracle reproduces
    * it bit-for-bit. Composes on [[decodeMeta]]'s output — one map-only
    * pass after the decode pass.
    */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    val t = ResizeTarget
    // scale by the larger side: out = ceil(dim * t / max(w, h)), min 1
    val mx = greatest(col("width"), col("height"))
    def fit(dim: org.apache.spark.sql.Column) =
      greatest(ceil(dim * t / mx).cast("long"), lit(1L))
    decodeMeta(spark, dir)
      .select(col("doc_id"), col("width"), col("height"),
        fit(col("width")).as("out_width"),
        fit(col("height")).as("out_height"))
      .orderBy("doc_id")
  }

  val FeatureDim = 8

  /** STUB feature extraction: an [[FeatureDim]]-dim "embedding" per
    * payload, derived deterministically from the sha256 digest (byte i
    * scaled to [0,1]) — a real pipeline would run an image encoder
    * here. The Spark-side shape is the production one: batch kernel
    * output joins the corpus as an `array<double>` column ready for
    * [[Similarity]]/[[Dedup.embeddingNearDupLsh]]-style consumers.
    */
  def featureStub(spark: SparkSession, dir: String): DataFrame = {
    val sha = col("sha")
    val feats = (0 until FeatureDim).map { i =>
      round(conv(substring(sha, 2 * i + 1, 2), 16, 10).cast("double") / 255.0, 6)
    }
    decodeMeta(spark, dir)
      .select(col("doc_id"), posexplode(array(feats: _*)))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("dim"),
        col("col").as("f"))
      .orderBy("doc_id", "dim")
  }

  val ChunkBytes = 256

  /** Fixed-size chunking of payloads — the frame-sampling / tiling
    * shape: one row per chunk with a content hash, `explode` over a
    * computed offset sequence (no driver involvement, parallel by doc).
    */
  def chunkPayloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("start",
        explode(sequence(lit(1), greatest(length(col("text")), lit(1)), lit(ChunkBytes))))
      .withColumn("chunk", col("text").substr(col("start"), lit(ChunkBytes)))
      .select(
        col("doc_id"),
        ((col("start") - 1) / ChunkBytes).cast("long").as("chunk_id"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  val FrameSampleK = 8

  /** Video frame sampling — the TEMPORAL analogue of
    * [[chunkPayloads]]'s spatial tiling: each payload carries stream
    * metadata (frame count and fps — STUB-derived from the byte
    * length; real pipelines read container headers inside the same
    * decode kernel as [[decodeStub]]) and the operator emits the
    * standard uniform-K frame sample: sample k picks frame
    * ⌊k·n/K⌋ with its millisecond timestamp. All integer arithmetic
    * (engine-exact), map-only `sequence`+`explode` — no driver
    * involvement, partition-count independent; the pixel fetch for the
    * selected frames composes downstream exactly like the decode.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir)
      .select(col("doc_id"),
        (col("n_bytes") % 240 + 16).as("n_frames"),
        (col("n_bytes") % 24 + 6).as("fps"))
      .select(col("doc_id"), col("n_frames"), col("fps"),
        explode(sequence(lit(0L), lit(FrameSampleK - 1L))).as("sample_no"))
      .withColumn("frame_no",
        expr(s"CAST((sample_no * n_frames) DIV $FrameSampleK AS BIGINT)"))
      .withColumn("ts_ms", expr("CAST((frame_no * 1000) DIV fps AS BIGINT)"))
      .select(col("doc_id"), col("sample_no"), col("frame_no"), col("ts_ms"),
        col("n_frames"), col("fps"))
      .orderBy("doc_id", "sample_no")

  /** Perceptual-hash width / banding: [[PhashBits]]-bit average hash,
    * [[PhashBands]] bands of bits/bands each — by pigeonhole, any pair
    * at Hamming ≤ bands−1 (= [[PhashMaxHamming]]) shares a full band,
    * so the banded candidate join is LOSSLESS at the emitted threshold
    * (the [[Dedup.simHashPairs]] argument at image width).
    */
  val PhashBits = 16
  val PhashBands = 2
  val PhashMaxHamming = 1L

  /** `mm_phash_pairs`: perceptual near-dup pairs over the media corpus
    * — the image half of dedup. Per-"image" features (the stubbed
    * decode's byte channels; a real kernel emits DCT/average-pool
    * values from pixels) are thresholded against their PER-CORPUS
    * per-dimension mean — the classic average-hash: bit i says "this
    * image is above corpus average in channel i" — packing each image
    * into a [[PhashBits]]-bit signature. Near-dups are pairs at
    * Hamming ≤ [[PhashMaxHamming]], found by the banded join, never
    * all-pairs.
    *
    * Scale shape: features are map-only over decoded batches; the
    * thresholds are ONE dim-sized broadcast (a [[PhashBits]]-row
    * aggregate, combiner-friendly, decimal-summed so the mean is
    * order-exact); signatures are one combiner-friendly groupBy(doc);
    * candidates come banded (~2·2⁻⁸ of pairs at this width), each
    * verified with an integer XOR popcount. Every stage is exact
    * integer/6dp arithmetic, replayed bit-for-bit by the oracle.
    */
  /** Per-channel thresholds trained on the HISTORY side — the phash
    * analogue of a served index statistic: new images must be hashed
    * with the thresholds the stored signatures used, or batch and
    * store bits mean different things. 16 values, collected once and
    * shipped in the task closure (the codebook contract).
    */
  private[graft] def historyMu(spark: SparkSession, dir: String): IndexedSeq[Double] = {
    val splitOf = substring(md5(concat(lit("inc:"), col("doc_id").cast("string"))), 1, 1)
    val f = Tables.documents(spark, dir)
      .filter(splitOf >= Dedup.IncBatchThreshold)
      .select(col("doc_id"),
        explode(sequence(lit(1), lit(PhashBits))).as("dim"),
        sha2(encode(col("text"), "UTF-8"), 256).as("sha"))
      .select(col("dim").cast("long").as("dim"),
        round(conv(expr("substring(sha, 2*dim - 1, 2)"), 16, 10).cast("double")
          / 255.0, 6).as("f"))
    f.groupBy("dim")
      .agg(round(sum(col("f").cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("mu"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)
      .toIndexedSeq
  }

  /** The whole signature as ONE map-side expression (no explode, no
    * aggregate): bit i set iff channel i beats its trained threshold.
    * Shared verbatim by the batch incremental and its streaming twin —
    * the stream needs it because a streaming query gets one aggregate,
    * and the pair fold is it.
    */
  private[graft] def phashExpr(sha: org.apache.spark.sql.Column,
      mu: IndexedSeq[Double]): org.apache.spark.sql.Column =
    (0 until PhashBits).map { i =>
      when(round(conv(substring(sha, 2 * i + 1, 2), 16, 10).cast("double")
        / 255.0, 6) > mu(i), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Band structs (band, bkey) for a signature column — map-only. */
  private[graft] def phashBands(ph: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val bandBits = PhashBits / PhashBands
    val mask = (1L << bandBits) - 1
    array((0 until PhashBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(ph, bandBits * b).bitwiseAND(lit(mask)).as("bkey"))
    }: _*)
  }

  /** The history side's banded signature store (hist_id, band, bkey,
    * h_ph) — in production a materialized table maintained by ingest,
    * here derived from the split (the [[Dedup.incremental]] contract).
    */
  private[graft] def historyPhashStore(spark: SparkSession, dir: String,
      mu: IndexedSeq[Double]): DataFrame = {
    val splitOf = substring(md5(concat(lit("inc:"), col("doc_id").cast("string"))), 1, 1)
    Tables.documents(spark, dir)
      .filter(splitOf >= Dedup.IncBatchThreshold)
      .select(col("doc_id").as("hist_id"),
        phashExpr(sha2(encode(col("text"), "UTF-8"), 256), mu).as("h_ph"))
      .select(col("hist_id"), col("h_ph"),
        explode(phashBands(col("h_ph"))).as("bk"))
      .select(col("hist_id"), col("h_ph"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** `mm_phash_incremental`: the ingest form of perceptual dedup — a
    * batch of new images probes the HISTORICAL signature store only
    * (batch-internal pairs are [[phashPairs]]' job on the batch
    * alone), completing the incremental family across modalities:
    * exact, MinHash, SimHash, spans, semantic, and now images all have
    * batch-vs-history twins. Thresholds are the history's
    * ([[historyMu]]); candidates come banded; a multi-band collision
    * folds to one row. Scale shape: everything batch-sized except the
    * store scan, which in production is the pre-materialized banded
    * signature table.
    */
  def phashIncremental(spark: SparkSession, dir: String): DataFrame = {
    val mu = historyMu(spark, dir)
    val splitOf = substring(md5(concat(lit("inc:"), col("doc_id").cast("string"))), 1, 1)
    val batch = Tables.documents(spark, dir)
      .filter(splitOf < Dedup.IncBatchThreshold)
      .select(col("doc_id").as("batch_id"),
        phashExpr(sha2(encode(col("text"), "UTF-8"), 256), mu).as("ph"))
      .select(col("batch_id"), col("ph"),
        explode(phashBands(col("ph"))).as("bk"))
      .select(col("batch_id"), col("ph"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    batch.join(historyPhashStore(spark, dir, mu), Seq("band", "bkey"))
      .select(col("batch_id"), col("hist_id"),
        expr("CAST(bit_count(ph ^ h_ph) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .groupBy("batch_id", "hist_id")
      .agg(min("hamming").as("hamming"))
      .orderBy("batch_id", "hist_id")
  }

  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    val f = decodeMeta(spark, dir)
      .select(col("doc_id"),
        explode(sequence(lit(1), lit(PhashBits))).as("dim"), col("sha"))
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        round(conv(expr("substring(sha, 2*dim - 1, 2)"), 16, 10).cast("double")
          / 255.0, 6).as("f"))
    val mu = f.groupBy("dim")
      .agg(round(sum(col("f").cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("mu"))
    val ph = f.join(broadcast(mu), "dim")
      .groupBy("doc_id")
      .agg(sum(when(col("f") > col("mu"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(dim - 1 AS INT))"))
        .otherwise(lit(0L))).as("ph"))
    val bandBits = PhashBits / PhashBands
    val mask = (1L << bandBits) - 1
    val bands = ph.select(col("doc_id"), col("ph"),
        explode(sequence(lit(0), lit(PhashBands - 1))).as("b"))
      .withColumn("bk", expr(s"shiftright(ph, CAST($bandBits * b AS INT)) & $mask"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bk") === col("y.bk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("CAST(bit_count(x.ph ^ y.ph) AS BIGINT)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= PhashMaxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
