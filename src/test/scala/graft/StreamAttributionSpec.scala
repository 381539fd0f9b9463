package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Behavior
import graft.streaming.StreamAttribution
import graft.streaming.StreamAttribution.{AttribEvent, Credit}

class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L
  private var nextId = 0L
  private def ev(user: Long, minute: Long, typ: String): AttribEvent = {
    nextId += 1
    AttribEvent(nextId, user, new Timestamp(t0 + minute * 60000L), typ)
  }

  private def run(batches: Seq[AttribEvent]*): Seq[Credit] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AttribEvent]
    val q = StreamAttribution.credits(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_out").start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    val out = spark.table("attrib_out").as[Credit].collect().toSeq
    q.stop()
    spark.sql("DROP TABLE IF EXISTS attrib_out")
    out
  }

  /** Channel rollup of streaming credits, comparable to the batch report:
    * (channel → (touches, distinct conversions, credit sum)). */
  private def rollup(credits: Seq[Credit]): Map[String, (Long, Long, Long)] =
    credits.groupBy(_.channel).view.mapValues { cs =>
      (cs.size.toLong, cs.map(_.conv_id).distinct.size.toLong,
        cs.map(_.credit_ppm).sum)
    }.toMap

  private def batchRollup(
      events: Seq[AttribEvent]): Map[String, (Long, Long, Long)] =
    Behavior.linearAttribution(events.toDF()
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        lit(0.0).as("value")))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("streaming credits across micro-batches equal the batch report") {
    // u1: two touches then purchase (split 500k/500k), later another
    // purchase (the SAME touches credit again — batch parity);
    // u2: touch with no conversion; u3: conversion with no touches
    val batches = Seq(
      Seq(ev(1, 0, "view"), ev(2, 0, "view")),
      Seq(ev(1, 30, "click"), ev(3, 30, "purchase")),
      Seq(ev(1, 60, "purchase"), ev(1, 90, "purchase")))
    val got = run(batches: _*)
    assert(rollup(got) === batchRollup(batches.flatten))
    // both purchases of u1 credited both touches
    assert(got.count(_.user_id == 1L) === 4)
    assert(got.forall(_.credit_ppm === 500000L))
    assert(got.count(_.user_id == 3L) === 0, "no touches, no credit rows")
  }

  test("in-batch disorder sorted; same-micros touch counts (inclusive <=)") {
    val batches = Seq(Seq(
      // delivered out of order: purchase first in the batch, then its
      // touches — the in-batch event-time sort must credit both; the
      // view shares the purchase's exact timestamp (counts, <=)
      ev(4, 60, "purchase"), ev(4, 0, "click"), ev(4, 60, "view")))
    val got = run(batches: _*)
    assert(rollup(got) === batchRollup(batches.flatten))
    assert(got.map(_.channel).sorted === Seq("click", "view"))
    assert(got.forall(_.credit_ppm === 500000L))
  }

  test("touches outside the 24h window earn nothing (strict lower bound)") {
    val batches = Seq(Seq(
      ev(5, 0, "view"),            // exactly conv − 24h: excluded
      ev(5, 10, "click"),          // inside
      ev(5, 24 * 60, "purchase")))
    val got = run(batches: _*)
    assert(rollup(got) === batchRollup(batches.flatten))
    assert(got.map(_.channel) === Seq("click"))
    assert(got.head.credit_ppm === 1000000L)
  }

  test("idle users are evicted and restart with an empty touch history") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AttribEvent]
    val q = StreamAttribution.credits(in.toDS(), idleTimeoutMinutes = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_evict").start()
    in.addData(Seq(ev(6, 0, "view"))); q.processAllAvailable()
    // another user far ahead advances the watermark past u6's timeout
    in.addData(Seq(ev(7, 100, "view"))); q.processAllAvailable()
    in.addData(Seq(ev(7, 200, "view"))); q.processAllAvailable()
    // u6 converts within its original 24h window — but state was evicted,
    // so the conversion finds no touches
    in.addData(Seq(ev(6, 300, "purchase"))); q.processAllAvailable()
    val out = spark.table("attrib_evict").as[Credit].collect().toSeq
    q.stop()
    spark.sql("DROP TABLE IF EXISTS attrib_evict")
    assert(out.isEmpty, s"evicted touch history must not earn credit: $out")
  }

  test("maxTouches cap drops the oldest touches first") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AttribEvent]
    val q = StreamAttribution.credits(in.toDS(), maxTouches = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_cap").start()
    in.addData(Seq(ev(8, 0, "view"), ev(8, 1, "view"), ev(8, 2, "click"),
      ev(8, 3, "purchase")))
    q.processAllAvailable()
    val out = spark.table("attrib_cap").as[Credit].collect().toSeq
    q.stop()
    spark.sql("DROP TABLE IF EXISTS attrib_cap")
    // cap 2 kept the two NEWEST touches (view@1 dropped? no — view@0)
    assert(out.map(t => (t.channel, (t.touch_us - t0 * 1000L) / 60000000L))
      .sorted === Seq(("click", 2L), ("view", 1L)))
    assert(out.forall(_.n_touches === 2L))
  }
}
