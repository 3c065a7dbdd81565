package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators for LLM-data pipelines (north star; not
  * reference-derived — SURVEY.md §2.5 notes the reference has none).
  *
  * Scale posture: every pair-producing operator goes through an
  * inverted-index join (explode the feature, join on the feature,
  * group by pair) — never a cross join. At 100 TB the candidate set is
  * bounded by feature-bucket sizes; hot buckets (stopword shingles)
  * are the skew risk, handled by AQE skew-join locally and salting in
  * production. MinHash-LSH bounds candidates further: only docs
  * agreeing on a full band collide.
  *
  * All hashes are md5-derived so the DuckDB oracle reproduces them
  * bit-for-bit.
  */
object Dedup {

  /** Lowercased letter-run tokens (same tokenizer as TextAnalysis). */
  private def toksLower: Column =
    filter(split(lower(col("text")), TextAnalysis.TokenSplitRe), t => length(t) > 0)

  // Cached intermediates can't be unpersisted inside the builders (the
  // returned DataFrame is lazy — the cache must survive until the
  // caller's action). Instead each builder retires the PREVIOUS
  // invocation's caches, bounding storage to one generation in
  // long-lived sessions (Bench/Verify/test reuse one SparkSession).
  private val liveCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private def cacheTracked(df: DataFrame): DataFrame = liveCaches.synchronized {
    liveCaches += df
    df.cache()
  }
  private def retirePreviousCaches(): Unit = liveCaches.synchronized {
    liveCaches.foreach(_.unpersist(false))
    liveCaches.clear()
  }

  /** Distinct word n-gram shingles of a token array; a doc shorter than
    * n tokens contributes its whole text as one shingle.
    */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .when(size(toks) > 0, array(concat_ws(" ", toks)))
      .otherwise(array().cast("array<string>"))
  }

  /** Shingle computation runs as a typed `mapPartitions` pass: the
    * Column formulation ([[shingles]], kept for composition/tests)
    * chains three interpreted higher-order functions per row and
    * dominated the dedup wall time (measured 10-200s at sf0.1 vs <1s
    * here); a compiled per-partition loop with a precompiled regex is
    * the right engine-side kernel for this shape. Semantics identical:
    * lowercase letter-run tokens, distinct 3-grams, whole-text
    * fallback for short docs.
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // small single-file inputs arrive as ONE scan partition; fan the
    // CPU-bound kernel out to the cluster (cheap round-robin of ids+text)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile("[^\\p{L}]+")
        it.map { case (id, text) =>
          val toks = re.split(text.toLowerCase).filter(_.nonEmpty)
          val sh =
            if (toks.length >= 3)
              toks.sliding(3).map(_.mkString(" ")).toArray.distinct
            else if (toks.nonEmpty) Array(toks.mkString(" "))
            else Array.empty[String]
          (id, sh)
        }
      }
      .toDF("doc_id", "sh")
  }

  /** Exact dedup: group by content fingerprint, keep the smallest
    * doc_id. The canonical first pass of any dedup pipeline: one
    * shuffle on the hash, combiner-friendly.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(TextAnalysis.normalizedText(col("text"))).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy("fp")

  /** Near-dup pairs by 3-gram Jaccard ≥ 0.3, via the inverted-index
    * join: explode shingles, self-join on the shingle, count common
    * shingles per pair, then |A∩B| / (|A|+|B|−|A∩B|). No cross join —
    * candidate pairs only exist where at least one shingle is shared.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    retirePreviousCaches()
    // cached: feeds both self-join sides plus the per-doc size agg
    val sh = cacheTracked(docShingles(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("s")))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("common").cast("double")
                / (col("sa.n") + col("sb.n") - col("common")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  val MinHashFns = 16
  val MinHashBands = 4
  val MinHashRows: Int = MinHashFns / MinHashBands // 4

  /** MinHash signature + banded LSH + exact-Jaccard verification.
    *
    * Hash family i: `md5(i ++ ":" ++ shingle)`; the signature component
    * is the minimum digest (fixed-width hex, so string-min == value-min).
    * Docs sharing any of the 4 bands (concatenated 4-component keys)
    * become candidates; candidates are verified with true Jaccard ≥ 0.3
    * over their shingle sets. At scale: signature computation is one
    * groupBy over exploded shingles; the LSH join touches only
    * band-collisions — the whole point vs. the O(n²) alternative.
    */
  def minHashLsh(spark: SparkSession, dir: String): DataFrame = {
    retirePreviousCaches()
    // shArr and bands each feed two join sides; cache so the shingle +
    // signature pipeline runs once, not four times (4x wall measured)
    val shArr = cacheTracked(docShingles(spark, dir))
    val ex = shArr.select(col("doc_id"), explode(col("sh")).as("s"))
    val sigCols = (0 until MinHashFns).map { i =>
      min(md5(concat_ws(":", lit(i), col("s")))).as(s"h$i")
    }
    val sigs = ex.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val bandStructs = (0 until MinHashBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until MinHashRows).map(r => col(s"h${MinHashRows * b + r}")): _*)
          .as("bkey"))
    }
    val bands = cacheTracked(sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey")))
    val cand = bands.as("x")
      .join(bands.as("y"), Seq("band", "bkey"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val inter = size(array_intersect(col("A.sh"), col("B.sh"))).cast("double")
    cand
      .join(shArr.as("A"), col("doc_a") === col("A.doc_id"))
      .join(shArr.as("B"), col("doc_b") === col("B.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(inter / (size(col("A.sh")) + size(col("B.sh")) - inter), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  val SimHashBits = 64

  /** 64-bit SimHash per document over token md5s, emitted as a
    * '0'/'1' bit string (portable across engines — no int64 overflow
    * games). Bit b comes from bit b of the token's md5 read MSB-first
    * (equivalently: hex digit b/4, mask 8>>(b%4) — the formulation the
    * DuckDB oracle uses); the bit is set iff the occurrence-weighted
    * vote is ≥ 0.
    *
    * Runs as a map-only typed kernel: one pass per partition, md5s
    * memoized per distinct token (vocabularies are tiny relative to
    * occurrences), NO shuffle at all — at 100 TB this is embarrassingly
    * parallel, vs. the naive explode-tokens-×-64-aggregates plan whose
    * shuffle carries every token occurrence.
    */
  def simHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism) // see docShingles
      .as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile("[^\\p{L}]+")
        val md = java.security.MessageDigest.getInstance("MD5")
        val bitCache = scala.collection.mutable.HashMap.empty[String, Array[Int]]
        it.flatMap { case (id, text) =>
          val toks = re.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
          if (toks.isEmpty) Iterator.empty // docs with no tokens emit no signature
          else {
            val votes = new Array[Long](SimHashBits)
            toks.foreach { t =>
              val bits = bitCache.getOrElseUpdate(t, {
                val d = md.digest(t.getBytes("UTF-8"))
                Array.tabulate(SimHashBits)(b =>
                  if ((d(b / 8) & (0x80 >> (b % 8))) != 0) 1 else -1)
              })
              var b = 0
              while (b < SimHashBits) { votes(b) += bits(b); b += 1 }
            }
            val sb = new java.lang.StringBuilder(SimHashBits)
            votes.foreach(v => sb.append(if (v >= 0) '1' else '0'))
            Iterator.single((id, sb.toString))
          }
        }
      }
      .toDF("doc_id", "simhash")
      .orderBy("doc_id")
  }

  val CosineDupThreshold = 0.4

  /** Embedding near-dup pairs: cosine ≥ 0.4 over the 64-dim vectors.
    * This is the *exact* O(n²) baseline, kept for small candidate sets
    * and as the verifier behind [[Similarity.annIvf]]'s bucketed scale
    * path. Math in double throughout; both engines widen float32
    * identically, and results are rounded before the threshold so the
    * comparison is stable.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.dot
    // repartition: the single-file scan would otherwise leave the whole
    // O(n^2) nested-loop join on one task
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("norm", sqrt(dot(spark, col("v"), col("v"))))
    emb.as("a")
      .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dot(spark, col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6)
          .as("cosine"))
      .filter(col("cosine") >= CosineDupThreshold)
      .orderBy("vec_a", "vec_b")
  }
}
