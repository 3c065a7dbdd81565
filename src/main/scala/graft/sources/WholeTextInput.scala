package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's input/output surface, Spark-native.
  *
  * O1 (whole-file text scan): one file = one split = one record, read
  * fully as a string (reference `mr/worker.go:59-67`, one map task per
  * file `mr/master.go:326-338`). Spark's `wholetext` text source gives
  * the same contract declaratively; `input_file_name()` supplies the
  * filename that the reference passes to `mapf`.
  *
  * Scale note: whole-file records are the reference's model, kept for
  * parity — at 100 TB you'd use record-split reads (`spark.read.text`
  * without `wholetext`) so a single huge file fans out across tasks;
  * this helper is for corpora of many moderate files.
  */
object WholeTextInput {

  /** (filename, contents) per file — the exact `mapf` input shape. */
  def read(spark: SparkSession, pathGlob: String): Dataset[(String, String)] = {
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    spark.read
      .option("wholetext", "true")
      .text(pathGlob)
      .select(input_file_name().as("filename"), col("value").as("contents"))
      .as[(String, String)]
  }
}

/** O8 (per-partition text sink): `"key value"` lines, one file per
  * reduce partition (reference `mr/worker.go:159-174`, format fixed at
  * `main/mrsequential.go:81`). The global result is the concatenation
  * of part files, compared after a sort (`main/test-mr.sh:59-60`) —
  * so partition file assignment is free to differ.
  */
object KeyValueTextSink {
  def write(kv: DataFrame, outDir: String, numPartitions: Int): Unit =
    kv.repartition(numPartitions, col("key")) // hash-by-key: all rows of a
      .select(concat_ws(" ", col("key"), col("value")).as("value")) // key land
      .write.mode("overwrite").text(outDir) // in one part file, like ihash%n
}
