package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, Double)*) =
    rows.toDF("user_id", "event_type", "us", "value")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), col("value"))

  test("funnel: stages must occur in strict temporal order per user") {
    // u1 completes view→click→purchase in order; u2 clicks BEFORE its
    // first view (click must not count); u3 views only; u4 has a
    // purchase with no prior click (must not reach stage 3)
    val events = ev(
      (1L, "view", 100L, 0), (1L, "click", 200L, 0), (1L, "purchase", 300L, 0),
      (2L, "click", 100L, 0), (2L, "view", 200L, 0),
      (3L, "view", 100L, 0),
      (4L, "view", 100L, 0), (4L, "purchase", 200L, 0))
    val r = Behavior.funnel(events).collect()
    assert(r.map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq ===
      Seq((1, "view", 4L), (2, "click", 1L), (3, "purchase", 1L)))
    // conv_milli: 1000, 250, 250
    assert(r.map(_.getLong(3)).toSeq === Seq(1000L, 250L, 250L))
  }

  test("funnel: same-timestamp events do not chain (strictly after)") {
    val events = ev(
      (1L, "view", 100L, 0), (1L, "click", 100L, 0),
      (2L, "view", 100L, 0), (2L, "click", 101L, 0))
    val users = Behavior.funnel(events, Seq("view", "click"))
      .collect().map(_.getLong(2)).toSeq
    assert(users === Seq(2L, 1L))
  }

  test("funnel census plan reads only materialized frontiers (no per-branch event re-scan)") {
    val events = Tables.events(spark, sf)
    val report = Behavior.funnel(events)
    // every stage frontier is an eager localCheckpoint, so the census
    // branches aggregate RDD scans — the parquet events table appears in
    // the final plan ZERO times (its scans ran once per stage, during
    // checkpointing; pre-fix the stage-k branch re-ran stages 1..k-1,
    // i.e. O(k²) event scans across the report)
    val planStr = report.queryExecution.executedPlan.toString
    val nScans = "FileScan".r.findAllIn(planStr).length
    assert(nScans === 0,
      s"funnel census must not re-scan events, saw $nScans file scans:\n$planStr")
    assert(planStr.contains("ExistingRDD"),
      s"expected checkpointed frontier scans in:\n$planStr")
    // and the report is still a monotone funnel anchored at stage 1
    val rows = report.collect()
    assert(rows.length === 3)
    val users = rows.map(_.getAs[Long]("users"))
    assert(users === users.sorted.reverse)
  }

  test("cohortRetention: offsets count distinct active days from first day") {
    val d = 86400000000L
    val events = ev(
      (1L, "view", 0L, 0), (1L, "view", d + 5L, 0), (1L, "click", 3 * d, 0),
      (2L, "view", d, 0), (2L, "view", d + 10L, 0), // same day twice
      (3L, "view", d, 0), (3L, "view", 2 * d, 0))
    val r = Behavior.cohortRetention(events)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r === Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (d, 0L, 2L), (d, 1L, 1L)))
  }

  test("madOutliers: lower median, MAD, and 3-MAD flags on the cents lattice") {
    // values 1.00 x5, 2.00 x4, 100.00 x1 → n=10, lower median = 1.00
    // (rank 5 of 10), deviations: 0 x5, 100 x4, 9900 x1 → MAD = 0 at
    // rank 5 → every d > 0 is an outlier (5 of them)
    val events = ev(
      (Seq.fill(5)(1.0) ++ Seq.fill(4)(2.0) ++ Seq(100.0))
        .zipWithIndex.map { case (v, i) => (i.toLong, "a", i * 10L, v) }: _*)
    val r = Behavior.madOutliers(events).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "a")
    assert(row.getLong(1) === 10L)        // n
    assert(row.getLong(2) === 100L)       // med_cents = 1.00
    assert(row.getLong(3) === 0L)         // mad_cents
    assert(row.getLong(4) === 5L)         // n_outliers (d > 0)
    assert(row.getLong(5) === 9900L)      // max_abs_dev
  }

  test("madOutliers: odd count takes the exact middle, outliers respect k·MAD") {
    // cents 100,200,300,400,500 → med=300; d = 200,100,0,100,200 → MAD=100
    // k=3 ⇒ outlier iff d > 300: none
    val events = ev((1 to 5).map(i =>
      (i.toLong, "t", i * 10L, i.toDouble)): _*)
    val row = Behavior.madOutliers(events).collect().head
    assert(row.getLong(2) === 300L)
    assert(row.getLong(3) === 100L)
    assert(row.getLong(4) === 0L)
  }

  private def evId(rows: (Long, Long, String, Long)*) =
    rows.toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"), lit(0.0).as("value"))

  test("linearAttribution: equal split, window strictly-after lower bound") {
    val hr = 3600000000L
    // conv 100 (u1, t=25h): touches view@24h-in-window? window 24h ⇒
    // touch_us > conv - 24h: view at t=1h is EXACTLY conv-24h ⇒ excluded;
    // click at 2h included; view at 25h (same instant) included (<=).
    // conv 200 (u2): no touches in window ⇒ no credit rows at all.
    val events = evId(
      (1L, 1L, "view", 1L * hr), (2L, 1L, "click", 2L * hr),
      (3L, 1L, "view", 25L * hr), (100L, 1L, "purchase", 25L * hr),
      (4L, 2L, "view", 1L * hr), (200L, 2L, "purchase", 50L * hr))
    val r = Behavior.linearAttribution(events)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    // conv 100 has 2 touches (click@2h, view@25h) → 500000 each
    assert(r === Seq(("click", 1L, 1L, 500000L), ("view", 1L, 1L, 500000L)))
  }

  test("linearAttribution: floor truncation on 3-way splits") {
    val hr = 3600000000L
    val events = evId(
      (1L, 1L, "view", 1L * hr), (2L, 1L, "view", 2L * hr),
      (3L, 1L, "click", 3L * hr), (100L, 1L, "purchase", 4L * hr))
    val r = Behavior.linearAttribution(events)
      .collect().map(x => (x.getString(0), x.getLong(3))).toSeq
    // 1000000 div 3 = 333333 per touch
    assert(r === Seq(("click", 333333L), ("view", 666666L)))
  }

  test("linearAttribution: bucketed interval join matches user-keyed " +
      "exactly, including window-boundary and bucket-boundary touches") {
    val hr = 3600000000L
    // touches straddle bucket boundaries relative to each conv: conv at
    // 25h (bucket 1) must see touches in buckets 0 and 1; the 1h touch
    // sits EXACTLY at conv-24h (excluded by the strict bound on either
    // path); extra user with a conv at a bucket's first microsecond
    val events = evId(
      (1L, 1L, "view", 1L * hr), (2L, 1L, "click", 2L * hr),
      (3L, 1L, "view", 25L * hr), (100L, 1L, "purchase", 25L * hr),
      (4L, 2L, "view", 23L * hr), (200L, 2L, "purchase", 24L * hr),
      (5L, 3L, "click", 47L * hr), (300L, 3L, "purchase", 49L * hr),
      (400L, 3L, "purchase", 90L * hr))
    val plain = Behavior.linearAttribution(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val bucketed = Behavior.linearAttribution(events, bucketed = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(bucketed === plain)
    assert(plain.nonEmpty)
  }

  test("ewmaTrend: dyadic decay over gaps, real buckets only") {
    val hr = 3600000000L
    // type t: hour 0 → 100 cents, hour 2 → 400 cents (hour 1 missing)
    val events = ev(
      (1L, "t", 0L * hr, 1.0), (2L, "t", 2L * hr, 4.0))
    val r = Behavior.ewmaTrend(events, lags = 3)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toSeq
    // weights (lag 0,1,2) = 4,2,1; den = 7
    // h=0: num = 100·4 = 400, ewma = 57
    // h=2: num = 400·4 + 0·2 + 100·1 = 1700, ewma = 242
    // h=1 is NOT emitted (no real bucket)
    assert(r === Seq((0L, 100L, 400L, 57L), (2L, 400L, 1700L, 242L)))
  }
}
