package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** One-off plan probe for the exact O(n^2) near-dup regression. */
object ProbeNearDup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.functions.VectorFunctions.dot
    val df = Dedup.embeddingNearDup(spark, dir)
    println("[probe] === current operator plan ===")
    println(df.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    time("current operator")(println(df.count()))

    // variant: no fanOut (plain single-partition scan)
    val embNoRep = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(spark, col("v"), col("v"))))
    val v2 = embNoRep.as("a")
      .join(embNoRep.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dot(spark, col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6).as("cosine"))
      .filter(col("cosine") >= Dedup.CosineDupThreshold)
    println("[probe] === no-repartition variant plan ===")
    println(v2.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    time("no-repartition variant")(println(v2.count()))

    // variant: explicit broadcast of one side
    val emb3 = Kernels.fanOut(Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
      .withColumn("norm", sqrt(dot(spark, col("v"), col("v"))))
    val v3 = broadcast(emb3.as("a"))
      .join(emb3.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dot(spark, col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6).as("cosine"))
      .filter(col("cosine") >= Dedup.CosineDupThreshold)
    time("broadcast-side variant")(println(v3.count()))
    spark.stop()
  }
}
