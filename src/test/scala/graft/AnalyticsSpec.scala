package graft

import graft.operators.Analytics

/** Result sanity + physical-plan shape assertions: the point is not just
  * that values match the oracle (Verify covers that) but that the PLANS are
  * the ones that survive a 100× scale-up.
  */
class AnalyticsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("recentTopK plans TakeOrderedAndProject, not a global sort") {
    val df = Analytics.recentTopK(Tables.events(spark, sf), 10)
    assert(plan(df).contains("TakeOrderedAndProject"))
    assert(df.count() === 10)
  }

  test("q5 joins broadcast the small dims") {
    val df = Analytics.regionRevenue(spark, sf)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"))
    assert(df.count() === 25) // 5 regions × 5 nations
  }

  test("pricingSummary pushes the shipdate filter to the parquet scan") {
    val df = Analytics.pricingSummary(Tables.lineitem(spark, sf))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(df.count() === 6)
  }

  test("pricingSummary partial-aggregates map-side") {
    val p = plan(Analytics.pricingSummary(Tables.lineitem(spark, sf)))
    // two HashAggregate nodes (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(p).length >= 2)
  }

  test("timeBucketAgg buckets by hour deterministically") {
    val df = Analytics.timeBucketAgg(Tables.events(spark, sf))
    val n = df.count()
    assert(n > 0 && n <= 31 * 24 * 5) // ≤ hours-in-January × 5 event types
  }

  test("topOrdersPerCustomer caps at k per customer") {
    val df = Analytics.topOrdersPerCustomer(Tables.orders(spark, sf), 3)
    val maxPer = df.groupBy("o_custkey").count()
      .agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
    assert(maxPer <= 3)
  }

  test("orderPriorityCount semi-join returns one row per priority") {
    val df = Analytics.orderPriorityCount(
      Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    assert(df.count() === 5)
  }
}
