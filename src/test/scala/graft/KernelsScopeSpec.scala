package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kernels

/** The thread-scoped tracked-cache registry contract: one query's
  * mid-flight retire (the [[graft.operators.Dedup]] splitState
  * pattern) must not drop a CONCURRENT query's pinned frames or
  * tracked checkpoint blocks. Round-11 verdict flagged the previous
  * registry as registry-global — correct under the sequential
  * Bench/Verify harness but a footgun for any concurrent-query
  * session; this spec pins the fixed scoping.
  */
class KernelsScopeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("one thread's retireCaches leaves a concurrent thread's pins alone") {
    import spark.implicits._
    val sc = spark.sparkContext

    @volatile var otherCache: org.apache.spark.sql.DataFrame = null
    @volatile var otherCkptId: Option[Int] = None
    val otherPinned = new java.util.concurrent.CountDownLatch(1)
    val mayRetire = new java.util.concurrent.CountDownLatch(1)
    val otherDone = new java.util.concurrent.CountDownLatch(1)
    @volatile var otherFailure: Throwable = null

    val other = new Thread(() => {
      try {
        // "query B": pin a cache and a tracked checkpoint, execute
        val df = Kernels.cacheTracked((1 to 100).toDF("x"))
        assert(df.count() == 100)
        val ck = Kernels.trackedCheckpoint((1 to 50).toDF("y"))
        assert(ck.count() == 50)
        otherCache = df
        otherCkptId = Kernels.checkpointRddId(ck)
        otherPinned.countDown()
        mayRetire.await() // hold the pins across A's retire
        Kernels.retireCaches() // B's own retire drains B's scope
      } catch { case t: Throwable => otherFailure = t }
      finally otherDone.countDown()
    })
    other.start()
    otherPinned.await()

    // "query A" on this thread: pin, execute, retire mid-session
    val mine = Kernels.cacheTracked((1 to 10).toDF("z"))
    assert(mine.count() == 10)
    Kernels.retireCaches()
    assert(mine.storageLevel == StorageLevel.NONE,
      "A's retire must drop A's own cache")

    // B's pins must have survived A's retire
    assert(otherCache.storageLevel != StorageLevel.NONE,
      "A's retire dropped B's pinned cache — registry scope leaked")
    assert(otherCkptId.exists(id => sc.getPersistentRDDs.contains(id)),
      "A's retire freed B's tracked checkpoint blocks")

    mayRetire.countDown()
    otherDone.await()
    assert(otherFailure == null, s"concurrent query failed: $otherFailure")
    assert(otherCache.storageLevel == StorageLevel.NONE,
      "B's own retire must drop B's cache")
    assert(otherCkptId.forall(id => !sc.getPersistentRDDs.contains(id)),
      "B's own retire must free B's checkpoint blocks")
  }

  test("a memo cache created on a foreign thread drains on any thread's retire") {
    import spark.implicits._
    // the stream_knn_maintain shape: a session memo (k-means
    // assignment, PQ codes) is CREATED inside foreachBatch on the
    // stream-execution thread, whose per-thread scope nothing ever
    // retires. Memo-lifetime pins must therefore live in the global
    // memo registry: the next retire from ANY thread drops the cache
    // together with the memo-invalidation hooks — otherwise clearing
    // the memo orphans the pinned blocks for the rest of the session.
    @volatile var memoDf: org.apache.spark.sql.DataFrame = null
    val t = new Thread(() => {
      memoDf = Kernels.memoCache((1 to 100).toDF("m"))
      assert(memoDf.count() == 100)
    })
    t.start(); t.join()
    assert(memoDf.storageLevel != StorageLevel.NONE)
    Kernels.retireCaches() // a query thread's ordinary retire
    assert(memoDf.storageLevel == StorageLevel.NONE,
      "memo cache built on the stream thread survived the query thread's retire")
  }

  test("a dead thread's unretired pins drain on the next retire from any thread") {
    import spark.implicits._
    val sc = spark.sparkContext
    // a convention violation: a short-lived thread pins a tracked
    // cache and a checkpoint but dies WITHOUT calling retireCaches
    // (the leak class the round-13 advisory named — a pool worker or
    // stream thread using cacheTracked instead of memoCache). The
    // backstop registry (scopes held strongly, threads weakly — a
    // collected Thread must never expunge its undrained scope's
    // pinned-frame list) must reclaim both on the next retire
    // from a live thread, while live threads' pins stay pinned (the
    // concurrency spec above).
    @volatile var deadCache: org.apache.spark.sql.DataFrame = null
    @volatile var deadCkptId: Option[Int] = None
    val t = new Thread(() => {
      val df = Kernels.cacheTracked((1 to 64).toDF("d"))
      assert(df.count() == 64)
      val ck = Kernels.trackedCheckpoint((1 to 32).toDF("e"))
      assert(ck.count() == 32)
      deadCache = df
      deadCkptId = Kernels.checkpointRddId(ck)
    })
    t.start(); t.join()
    assert(deadCache.storageLevel != StorageLevel.NONE,
      "the dead thread's pin should still be resident before any retire")
    Kernels.retireCaches() // an ordinary retire on a live thread
    assert(deadCache.storageLevel == StorageLevel.NONE,
      "a dead thread's orphaned cache must drain on the next retire")
    assert(deadCkptId.forall(id => !sc.getPersistentRDDs.contains(id)),
      "a dead thread's orphaned checkpoint blocks must drain on the next retire")
  }

  test("loopCheckpoint severs inherited plan statistics and tracks the persisted blocks") {
    import spark.implicits._
    val sc = spark.sparkContext
    // a self-join whose ESTIMATED stats a plain localCheckpoint would
    // inherit onto the new leaf (the compounding that melted the
    // 20+-round component loops — see Kernels.loopCheckpoint)
    val df = (1 to 100).toDF("x")
    val joined = df.as("a")
      .join(df.withColumnRenamed("x", "y").as("b"), $"x" === $"y")
      .select($"x")
    val plain = Kernels.trackedCheckpoint((1 to 100).toDF("x"))
    val (reset, id) = Kernels.loopCheckpoint(joined)
    // severed: the re-wrapped frame's leaf carries the session DEFAULT
    // size, not the join's product estimate
    val resetStats = reset.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(resetStats == BigInt(spark.sessionState.conf.defaultSizeInBytes),
      s"loopCheckpoint leaf must reset to defaultSizeInBytes, got $resetStats")
    // values ride through the re-wrap unchanged
    assert(reset.count() == 100)
    // the PERSISTED checkpoint id is returned (the wrapper's own leaf
    // is the unpersisted Row conversion) and its blocks are live...
    assert(id.exists(i => sc.getPersistentRDDs.contains(i)),
      "loopCheckpoint must return the persisted checkpoint RDD id")
    // ...until released by id, the loop's per-round discipline
    id.foreach(Kernels.releaseCheckpoint(sc, _))
    assert(id.forall(i => !sc.getPersistentRDDs.contains(i)))
    assert(plain.count() == 100)
    Kernels.retireCaches()
  }

  test("loopCheckpoint coverage audit: every data-dependent-round loop severs stats") {
    // The stats-compounding pathology (Kernels.loopCheckpoint) was
    // found at round ~20 of a convergence loop — nothing structural
    // stops a NEW loop from reintroducing it with a plain
    // trackedCheckpoint/localCheckpoint, so this audit pins the
    // source: a data-dependent-round loop (the `while (changed …)`
    // fixpoint shape) may exist only where the round cut goes through
    // Kernels.loopCheckpoint. Bounded-round loops (beam search,
    // PageRank's fixed iterations) may keep trackedCheckpoint — a
    // handful of stat inheritances is harmless; it is the UNBOUNDED
    // self-joining fixpoint that squares sizeInBytes to astronomical
    // BigInts. A new convergence loop must either route through
    // Dedup.clustersFromEdges or adopt loopCheckpoint and extend the
    // allowlist here.
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Path.of("src/main/scala/graft"))
      .iterator().asScala.filter(_.toString.endsWith(".scala")).toSeq
    val loopFiles = files.filter(p =>
      java.nio.file.Files.readString(p).contains("while (changed"))
    assert(loopFiles.map(_.getFileName.toString).toSet == Set("Dedup.scala"),
      s"unexpected data-dependent convergence loop in ${loopFiles.map(_.getFileName)} — " +
        "route it through Kernels.loopCheckpoint and extend this allowlist")
    loopFiles.foreach { p =>
      val s = java.nio.file.Files.readString(p)
      assert(s.contains("Kernels.loopCheckpoint"),
        s"$p: the convergence loop must cut rounds with Kernels.loopCheckpoint")
    }
  }

  test("bloom sizing clamps to the session's runtime maxNumBits") {
    import graft.functions.BloomFunctions
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
    // a store above ~9.2M keys at fpp 0.03 computes more bits than the
    // aggregate accepts — unclamped, BloomFilterAggregate fails analysis
    assert(BloomFunctions.optimalNumOfBits(20_000_000L, 0.03) > maxBits)
    assert(BloomFunctions.clampedNumOfBits(spark, 20_000_000L, 0.03) == maxBits)
    // small stores keep their optimal sizing
    assert(BloomFunctions.clampedNumOfBits(spark, 1000L, 0.03) ==
      BloomFunctions.optimalNumOfBits(1000L, 0.03))
    // and a clamped build still constructs a VALID filter end to end
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val store = (1 to 100).map(i => s"fp$i").toDF("fp")
    val bf = store.agg(BloomFunctions.bloomAgg(spark, col("fp"), 100L, 0.03))
      .head.getAs[Array[Byte]](0)
    val hits = store.filter(BloomFunctions.mightContain(spark, lit(bf), col("fp"))).count()
    assert(hits == 100, "a bloom filter must never reject its own keys")
  }
}
