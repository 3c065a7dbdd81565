package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Events}

/** Randomized differentials for the round-17 whale-window rewrites:
  * the hand-built boundary fixtures in OperatorsSpec pin the cases we
  * THOUGHT of; these replay each rewrite against its plain
  * single-window form on seeded random inputs — skewed cell sizes for
  * the banded rank, event streams with gaps engineered to straddle
  * chunk boundaries for the stitch and the carry. Spark trials are
  * expensive, so each property batches many random structures into ONE
  * frame per trial (clusters and users are independent under both
  * forms, which is itself part of what the differential checks).
  */
class ChunkedOpsPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("capCells equals the plain-window split on random skewed assignments") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xbad5eed)
    for (trial <- 1 to 3) {
      // heavy-tailed cell sizes: a whale, mid cells, singletons, and an
      // empty id range gap; ids shuffled so rank order != input order
      val sizes = Seq(400 + rnd.nextInt(200), 1 + rnd.nextInt(5),
        60 + rnd.nextInt(80), 1, 17 + rnd.nextInt(40))
      val rows = rnd.shuffle(
        sizes.zipWithIndex.flatMap { case (n, c) => Seq.fill(n)(c.toLong) }
          .zipWithIndex.map { case (c, i) => (i.toLong * 7 + 3, c) })
      val cap = 1 + rnd.nextInt(120)
      val assignment = rows.toDF("vec_id", "cluster")
      val banded = Dedup.capCells(assignment, cap).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
          r.getAs[Long]("sub"))).toSet
      val w = Window.partitionBy("cluster").orderBy(col("h"), col("vec_id"))
      val plain = assignment
        .withColumn("h", md5(concat(lit("sd:"), col("vec_id").cast("string"))))
        .withColumn("sub",
          floor((row_number().over(w) - lit(1)) / lit(cap)).cast("long"))
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
          r.getAs[Long]("sub"))).toSet
      assert(banded == plain, s"trial $trial (cap=$cap) diverged")
    }
  }

  test("chunked sessionize and asof equal their plain windows on random event streams") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5e55)
    for (trial <- 1 to 3) {
      // per user: a random walk of gaps drawn to cluster AROUND the
      // 30-min session gap and the midnight chunk boundary — most gaps
      // 1-40 min (both sides of the gap), some multi-hour, some
      // multi-day (empty-chunk case); types salted so purchases and
      // errors land on both sides of every boundary
      val base = 1704067200L * 1000000L // 2024-01-01T00:00:00Z in µs
      var id = 0L
      val rows = (0 until 12).flatMap { u =>
        var t = base + rnd.nextLong(36L * 3600 * 1000000)
        (0 until 5 + rnd.nextInt(60)).map { _ =>
          val gapUs = rnd.nextInt(4) match {
            case 0 => (1 + rnd.nextInt(40)).toLong * 60 * 1000000
            case 1 => (25 + rnd.nextInt(10)).toLong * 60 * 1000000
            case 2 => (1 + rnd.nextInt(30)).toLong * 3600 * 1000000
            case _ => (1 + rnd.nextInt(3)).toLong * 86400 * 1000000
          }
          t += gapUs
          id += 1
          (id, u.toLong, new java.sql.Timestamp(t / 1000) /* µs→ms: keep sub-s zero */,
            Seq("purchase", "error", "view")(rnd.nextInt(3)), rnd.nextInt(100) * 1.0)
        }
      }
      val events = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      // --- sessionize ---
      def sKey(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq"),
         r.getAs[Long]("n_events"), r.getAs[java.sql.Timestamp]("session_start"),
         r.getAs[java.sql.Timestamp]("session_end"))
      val chunkedS = Events.sessionizeOf(events).collect().map(sKey).toSet
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val plainS = events
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("ns", (col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000)
          .cast("long"))
        .withColumn("session_seq", sum("ns").over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"),
          max("ts").as("session_end"))
        .collect().map(sKey).toSet
      assert(chunkedS == plainS, s"trial $trial: sessionize diverged")
      // --- asof ---
      def aKey(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("error_id"),
         Option(r.getAs[java.lang.Long]("last_purchase_id")).map(_.toLong))
      val chunkedA = Events.asofLastPurchaseOf(events).collect().map(aKey).toSet
      val isP = col("event_type") === "purchase"
      val wA = Window.partitionBy("user_id")
        .orderBy(col("ts"), when(isP, 0).otherwise(1), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val plainA = events
        .withColumn("lp", last(when(isP, col("event_id")), ignoreNulls = true).over(wA))
        .filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("lp").as("last_purchase_id"))
        .collect().map(aKey).toSet
      assert(chunkedA == plainA, s"trial $trial: asof diverged")
    }
  }
}
