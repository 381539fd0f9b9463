package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.operators.Sessionize.{Event, Session}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(user: Long, minute: Long): Event =
    Event(user, new Timestamp(1700000000000L + minute * 60000L), "click")

  test("batch: gap splits sessions, counts and bounds correct") {
    val df = Seq(
      ev(1, 0), ev(1, 10), ev(1, 20),   // session 1: 3 events
      ev(1, 120), ev(1, 125),           // session 2 after 100-min gap
      ev(2, 5))                         // user 2: 1 session
      .toDF()
    val s = Sessionize.batchSessions(df, gapMinutes = 30)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(s === Set((1L, 1L, 3L), (1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("batch sessions on real events table are sane") {
    val events = Tables.events(spark, sf)
    val s = Sessionize.batchSessions(events, gapMinutes = 30)
    val total = s.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total === events.count()) // every event lands in exactly one session
    val bad = s.filter(col("session_end_us") < col("session_start_us")).count()
    assert(bad === 0)
  }

  test("streaming: a late in-watermark event extends the session start") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.streamingSessions(in.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("late_sessions").start()
    in.addData(ev(1, 20))
    q.processAllAvailable()
    in.addData(ev(1, 0)) // arrives late but within the watermark
    q.processAllAvailable()
    in.addData(ev(1, 500), ev(1, 1000)) // advance watermark to close it
    q.processAllAvailable()
    val s = spark.table("late_sessions").as[Session].collect()
      .filter(_.n_events == 2)
    q.stop()
    assert(s.nonEmpty)
    assert(s.head.session_start.getTime === 1700000000000L) // minute 0
    assert(s.head.session_end.getTime === 1700000000000L + 20 * 60000L)
  }

  test("streaming: an event far older than the watermark cannot crash the query") {
    // Two layers keep ancient events from killing the query: Spark drops
    // rows behind the watermark before they reach flatMapGroupsWithState,
    // and the operator itself clamps its event-time timeout to
    // watermark+1 (setTimeoutTimestamp throws on a timeout at/behind the
    // watermark, so an un-clamped stale `last` would be fatal if a stale
    // row ever did get through). processAllAvailable rethrows query
    // failures, so reaching the asserts proves survival.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.streamingSessions(in.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("very_late_sessions").start()
    in.addData(ev(1, 1000)) // watermark -> minute 970
    q.processAllAvailable()
    in.addData(ev(3, 0)) // ancient event for a fresh group: 0+30 << 970
    q.processAllAvailable()
    in.addData(ev(1, 2000)) // advance watermark; session 1 closes
    q.processAllAvailable()
    val got = spark.table("very_late_sessions").as[Session].collect()
      .map(s => (s.user_id, s.n_events)).toSet
    q.stop()
    assert(got.contains((1L, 1)))
    // the ancient row was dropped by the late-row filter, not sessionized
    assert(!got.exists(_._1 == 3L))
  }

  test("streaming: sessions close via event-time timeout and match batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Sessionize.streamingSessions(in.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    in.addData(ev(1, 0), ev(1, 10), ev(1, 20), ev(2, 5))
    q.processAllAvailable()
    // a much-later event advances the watermark past both sessions' gaps
    in.addData(ev(1, 500))
    q.processAllAvailable()
    in.addData(ev(1, 1000))
    q.processAllAvailable()
    val got = spark.table("sessions").as[Session].collect()
      .map(s => (s.user_id, s.n_events)).toSet
    q.stop()
    assert(got.contains((1L, 3)))
    assert(got.contains((2L, 1)))
  }
}
