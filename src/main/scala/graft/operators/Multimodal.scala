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
}
