package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north star; the reference has no similarity operators).
  *
  * Two tiers:
  *  - [[annTopK]]: exact brute force — broadcast the (small) probe set
  *    against the corpus, rank per probe. Scales linearly in corpus
  *    size × probes; the right answer when probes are few.
  *  - [[annIvf]]: IVF-style bucketing — vectors are assigned to one of
  *    64 coarse cells (argmax coordinate, a degenerate-but-deterministic
  *    codebook); probes search only their own cell. At 100 TB the cell
  *    assignment is a map-only pass and the search join touches
  *    1/|cells| of the corpus per probe. Recall < 1 by design — that is
  *    the ANN contract; [[Dedup.embeddingNearDup]] is the exact
  *    verifier at small scale.
  */
object Similarity {

  val TopK = 5
  val NumProbes = 10

  import graft.functions.VectorFunctions.dot

  private def withNorm(spark: SparkSession, df: DataFrame): DataFrame =
    Kernels.fanOut(
      df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))) // single-file scan -> parallel stream side
      .withColumn("norm", sqrt(dot(spark, col("v"), col("v"))))

  private def cosine(spark: SparkSession): Column =
    round(dot(spark, col("p.v"), col("c.v")) / (col("p.norm") * col("c.norm")), 6)

  /** Exact top-k cosine neighbors for the first [[NumProbes]] vectors.
    * The probe side is broadcast — no shuffle of the corpus; ranking
    * ties broken by neighbor id after rounding, so the result is
    * deterministic across engines and partitionings.
    */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(spark, Tables.embeddings(spark, dir))
    val probes = emb.filter(col("vec_id") < NumProbes)
    broadcast(probes).as("p")
      .join(emb.as("c"), col("p.vec_id") =!= col("c.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("c.vec_id").as("neighbor_id"),
              cosine(spark).as("sim"))
      .withColumn("rnk",
        row_number().over(Window.partitionBy("probe_id")
          .orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= TopK)
      .orderBy("probe_id", "rnk")
  }

  /** Coarse cell id: 1-based index of the max coordinate (computed on
    * the raw float32 values, identical in both engines).
    */
  private def cell(embedding: Column): Column =
    array_position(embedding, array_max(embedding)).cast("long")

  /** IVF-bucketed ANN: probes search only their own coarse cell.
    * Same ranking contract as [[annTopK]].
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    // assign the cell from the original float vector, carry the double view
    val base = Kernels.fanOut(
        Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"),
                  cell(col("embedding")).as("cell"),
                  col("embedding").cast("array<double>").as("v")))
      .withColumn("norm", sqrt(dot(spark, col("v"), col("v"))))
    val probes = base.filter(col("vec_id") < NumProbes)
    broadcast(probes).as("p")
      .join(base.as("c"),
            col("p.cell") === col("c.cell") && col("p.vec_id") =!= col("c.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("c.vec_id").as("neighbor_id"),
              cosine(spark).as("sim"))
      .withColumn("rnk",
        row_number().over(Window.partitionBy("probe_id")
          .orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rnk") <= TopK)
      .orderBy("probe_id", "rnk")
  }
}
