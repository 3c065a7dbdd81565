package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Physical-plan audits: the properties that decide whether these
  * queries survive a 100 TB scale-up, asserted on the actual plans.
  * (A plan that scans all columns, misses a pushed filter, or shuffles
  * a broadcastable dimension is a perf bug even when results match.)
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.Sf

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("q1: filter + column pruning reach the parquet scan; partial agg present") {
    val p = plan(Relational.q1PricingSummary(spark, sf))
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter must push down")
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
    assert(p.contains("partial_"), "map-side partial aggregation expected")
  }

  test("q5: all four dimension joins broadcast; no shuffle of dims") {
    val p = plan(Relational.q5LocalSupplier(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length +
      "BroadcastExchange".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected broadcast dims, got plan:\n${p.take(800)}")
  }

  test("top_orders plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.topOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("wc: partial aggregation before the exchange (the missing combiner)") {
    val p = plan(TextAnalysis.wordCount(spark, sf))
    assert(p.contains("partial_count") || p.contains("partial_"), p.take(800))
    assert(p.contains("hashpartitioning(word"), "shuffle must be on the word key")
  }

  test("ann_topk: probe side broadcast, dot product codegen expression in plan") {
    val p = plan(Similarity.annTopK(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"), "probes x corpus is a broadcast NLJ")
    assert(p.toLowerCase.contains("dotproduct") || p.contains("graft_dot"),
      "custom DotProduct expression should appear in the plan")
  }

  test("events scan prunes to referenced columns only") {
    val p = plan(Events.jsonExtract(spark, sf))
    assert(p.contains("event_id") && p.contains("props"))
    assert(!p.contains("user_id"), "unused events columns must be pruned")
  }

  test("anti join stays a join, not a driver-side collect") {
    val p = plan(Relational.customersWithoutBigOrders(spark, sf))
    assert(p.contains("LeftAnti"), p.take(500))
  }
}
