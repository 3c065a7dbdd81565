package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KeyValue, MapReduce, MRApps}

/** The reference's executable specification (SURVEY.md §5): the
  * distributed pipeline must equal the sequential oracle
  * (`main/mrsequential.go:25-87`) for any partitioning — here made an
  * explicit property instead of five shell goldens.
  */
class MapReduceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential model of mrsequential.go: flatMap, group, reduce. */
  private def sequentialModel(
      input: Seq[(String, String)],
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, Seq[String]) => String): Map[String, String] =
    input.flatMap { case (n, c) => mapf(n, c).iterator }
      .groupBy(_.key)
      .map { case (k, kvs) => k -> reducef(k, kvs.map(_.value)) }

  private val wcMapf = (name: String, contents: String) =>
    contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
      .map(w => KeyValue(w, "1")).toSeq
  private val wcReducef = (k: String, vs: Seq[String]) => vs.length.toString

  test("distributed wc == sequential model, independent of partitioning") {
    val input = Seq(
      "d0" -> "the quick brown fox the fox",
      "d1" -> "jumps over the lazy dog",
      "d2" -> "", // empty split: mapf emits nothing
      "d3" -> "fox fox fox")
    val expected = sequentialModel(input, wcMapf, wcReducef)
    for (parts <- Seq(1, 3, 7)) {
      val ds = spark.createDataset(input).repartition(parts)
      val got = MapReduce.run(ds, wcMapf, wcReducef)
        .collect().map(kv => kv.key -> kv.value).toMap
      assert(got === expected, s"at $parts partitions")
    }
  }

  test("order-sensitive reducef must sort internally (reference contract)") {
    // The engine guarantees key grouping, NOT value order (SURVEY.md §5);
    // a sorting reducef is deterministic across partitionings.
    val input = (0 until 50).map(i => (s"d$i", s"v${i % 7} k"))
    val mapf = (n: String, c: String) => Seq(KeyValue("k", n))
    val reducef = (k: String, vs: Seq[String]) => vs.sorted.mkString(",")
    val expected = sequentialModel(input, mapf, reducef)
    for (parts <- Seq(1, 5)) {
      val got = MapReduce.run(spark.createDataset(input).repartition(parts), mapf, reducef)
        .collect().map(kv => kv.key -> kv.value).toMap
      assert(got === expected)
    }
  }

  test("runCombining (map-side combine) matches run for monoidal reducef") {
    val input = Seq("a" -> "x y x", "b" -> "y y z x")
    val ds = spark.createDataset(input)
    val plain = MapReduce.run(ds, wcMapf, wcReducef)
      .collect().map(kv => kv.key -> kv.value).toMap
    val combined = MapReduce.runCombining[Long](
        ds, wcMapf, 0L, _ => 1L, _ + _, _.toString)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(combined === plain)
  }

  test("property: distributed == sequential for random KV bags") {
    val rnd = new scala.util.Random(42) // deterministic property sampling
    val words = Array("alpha", "beta", "gamma", "delta")
    for (trial <- 0 until 10) {
      val input = (0 until 1 + rnd.nextInt(8)).map { i =>
        val doc = Seq.fill(rnd.nextInt(13))(words(rnd.nextInt(words.length))).mkString(" ")
        (s"d$i", doc)
      }
      val expected = sequentialModel(input, wcMapf, wcReducef)
      val got = MapReduce.run(spark.createDataset(input).repartition(3), wcMapf, wcReducef)
        .collect().map(kv => kv.key -> kv.value).toMap
      assert(got === expected, s"trial $trial")
    }
  }

  test("crash app: mapf crashing on first attempt still equals the nocrash oracle") {
    // The reference's hardest guarantee (main/test-mr.sh:155-203,
    // mrapps/crash.go:20-32): correct output under worker crashes.
    // Every map task here throws on its FIRST attempt; Spark's task
    // retry (maxFailures=2 in the test master) re-executes it, and the
    // output must equal the crash-free run bit-for-bit.
    val input = Seq(
      "d0" -> "the quick brown fox the fox",
      "d1" -> "jumps over the lazy dog",
      "d2" -> "fox fox fox")
    // self-contained lambda: referencing the wcMapf FIELD would capture
    // the (non-serializable) suite instance in the task closure
    val crashingMapf = (name: String, contents: String) => {
      if (org.apache.spark.TaskContext.get.attemptNumber == 0)
        throw new RuntimeException("injected crash (mrapps/crash.go analogue)")
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
        .map(w => KeyValue(w, "1")).toSeq
    }
    val expected = sequentialModel(input, wcMapf, wcReducef)
    val got = MapReduce.run(
        spark.createDataset(input).repartition(3), crashingMapf, wcReducef)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === expected)
  }

  test("crash app: reducef crashing on first attempt still equals the nocrash oracle") {
    // the reference's crash app also dies inside Reduce
    // (mrapps/crash.go:35-49) — inject the same failure into the reduce
    // stage and require the retried output to be identical
    val input = Seq("d0" -> "the quick brown fox", "d1" -> "the fox")
    val mapf = (name: String, contents: String) =>
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
        .map(w => KeyValue(w, "1")).toSeq
    val crashingReducef = (k: String, vs: Seq[String]) => {
      if (org.apache.spark.TaskContext.get.attemptNumber == 0)
        throw new RuntimeException("injected reduce crash")
      vs.length.toString
    }
    val expected = sequentialModel(input, wcMapf, wcReducef)
    val got = MapReduce.run(
        spark.createDataset(input).repartition(2), mapf, crashingReducef)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === expected)
  }

  test("MRApps over testdata produce stable shapes") {
    val wc = MRApps.wc(spark, SparkTestSession.Sf).collect()
    assert(wc.nonEmpty && wc.forall(_.getAs[String]("value").toInt > 0))
    val idx = MRApps.indexer(spark, SparkTestSession.Sf).collect()
    assert(idx.nonEmpty)
    // "N doc1,doc2" — N equals the number of listed docs, list sorted
    idx.foreach { r =>
      val Array(n, docs) = r.getAs[String]("value").split(" ", 2)
      val ds = docs.split(",")
      assert(ds.length == n.toInt && ds.sameElements(ds.sorted))
    }
    val crash = MRApps.crashShape(spark, SparkTestSession.Sf).collect()
    assert(crash.map(_.getAs[String]("key")).sorted.sameElements(Array("a", "b", "c", "d")))
  }
}
