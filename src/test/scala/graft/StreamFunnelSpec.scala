package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Behavior
import graft.streaming.StreamFunnel
import graft.streaming.StreamFunnel.{FunnelEvent, StageReached}

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ev(user: Long, minute: Long, typ: String): FunnelEvent =
    FunnelEvent(user, new Timestamp(t0 + minute * 60000L), typ)

  private def run(batches: Seq[FunnelEvent]*): Seq[StageReached] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamFunnel.stageTransitions(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    val out = spark.table("funnel_out").as[StageReached].collect().toSeq
    q.stop()
    spark.sql("DROP TABLE IF EXISTS funnel_out")
    out
  }

  test("streaming transitions across micro-batches equal the batch funnel") {
    // u1 completes across three batches; u2 clicks before viewing (the
    // click must not count even though it arrives first); u3 views only
    val batches = Seq(
      Seq(ev(1, 0, "view"), ev(2, 0, "click"), ev(3, 0, "view")),
      Seq(ev(1, 10, "click"), ev(2, 10, "view")),
      Seq(ev(1, 20, "purchase")))
    val got = run(batches: _*)
    val reached = got.groupBy(_.stage_idx)
      .view.mapValues(_.map(_.user_id).toSet).toMap
    // batch twin on the same (flattened) data
    val batchDf = batches.flatten.toDF()
      .select(col("user_id"), col("ts"), col("event_type"))
    val expect = Behavior.funnel(batchDf).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(reached(1).size.toLong === expect(1))
    assert(reached(2).size.toLong === expect(2))
    assert(reached.get(3).map(_.size.toLong).getOrElse(0L) === expect(3))
    assert(reached(1) === Set(1L, 2L, 3L))
    assert(reached(2) === Set(1L))
  }

  test("same-timestamp events do not chain; in-batch disorder is sorted") {
    val got = run(Seq(
      // u4: click delivered before view in the batch but LATER in event
      // time — the in-batch sort must still chain view -> click
      ev(4, 5, "click"), ev(4, 0, "view"),
      // u5: view and click at the SAME timestamp — strictly-after fails
      ev(5, 0, "view"), ev(5, 0, "click")))
    val byUser = got.groupBy(_.user_id)
      .view.mapValues(_.map(_.stage_idx).toSet).toMap
    assert(byUser(4L) === Set(1, 2))
    assert(byUser(5L) === Set(1))
  }

  test("idle in-progress funnels are evicted by the watermark and restart") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamFunnel.stageTransitions(in.toDS(), idleTimeoutMinutes = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_evict").start()
    // A views at minute 0 (state created, timeout at +10 min event time)
    in.addData(Seq(ev(1, 0, "view"))); q.processAllAvailable()
    // unrelated traffic advances the watermark far past A's timeout...
    in.addData(Seq(ev(2, 60, "view"))); q.processAllAvailable()
    // ...and the next batch without A-data fires A's eviction
    in.addData(Seq(ev(2, 61, "click"))); q.processAllAvailable()
    // A's click now finds NO state: stage 2 must not fire
    in.addData(Seq(ev(1, 62, "click"))); q.processAllAvailable()
    // a fresh view restarts A's funnel from stage 1
    in.addData(Seq(ev(1, 63, "view"))); q.processAllAvailable()
    val got = spark.table("funnel_evict").as[StageReached].collect().toSeq
    q.stop()
    spark.sql("DROP TABLE IF EXISTS funnel_evict")
    val a = got.filter(_.user_id == 1L).map(r => (r.stage_idx, r.ts_us))
    assert(a.map(_._1).sorted === Seq(1, 1),
      s"evicted funnel must restart at stage 1, never chain stage 2: $a")
    assert(a.map(_._2).toSet ===
      Set(t0 * 1000L, (t0 + 63 * 60000L) * 1000L))
  }

  test("completed funnels drop their state; anchors carry event micros") {
    val got = run(
      Seq(ev(7, 0, "view"), ev(7, 1, "click"), ev(7, 2, "purchase")),
      // a second purchase after completion must NOT re-fire (state gone,
      // and a fresh state would need a view first)
      Seq(ev(7, 3, "purchase")))
    assert(got.map(_.stage_idx).sorted === Seq(1, 2, 3))
    val anchor = got.find(_.stage_idx == 3).get.ts_us
    assert(anchor === (t0 + 2 * 60000L) * 1000L)
  }
}
