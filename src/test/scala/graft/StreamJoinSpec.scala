package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamJoin

/** Stream-stream interval join: the streaming result must equal the batch
  * twin on the same data, and the join must produce nothing outside the
  * event-time window.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  final case class First(user_id: Long, first_id: Long, first_ts: Timestamp)
  final case class Second(s_user_id: Long, second_id: Long, second_ts: Timestamp)

  private def ts(minute: Int) =
    new Timestamp(1700000000000L + minute * 60000L)

  test("followWithinStream: inner join within the gap, state-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val fIn = MemoryStream[First]
    val sIn = MemoryStream[Second]
    val joined = StreamJoin.followWithinStream(
      fIn.toDF(), sIn.toDF(), gapMinutes = 30)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("follow_stream").start()
    fIn.addData(
      First(1, 100, ts(0)),
      First(1, 101, ts(50)),
      First(2, 102, ts(0)))
    sIn.addData(
      Second(1, 200, ts(10)),  // matches 100 (within 30)
      Second(1, 201, ts(45)),  // matches nothing (100+30<45, 101 later)
      Second(1, 202, ts(60)),  // matches 101
      Second(2, 203, ts(31)),  // outside 102's gap by 1 minute
      Second(3, 204, ts(5)))   // no first at all
    q.processAllAvailable()
    val got = spark.table("follow_stream")
      .select("first_id", "second_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(got === Set((100L, 200L), (101L, 202L)))
  }

  test("streaming result equals the batch twin on the events corpus") {
    val ev = Tables.events(spark, sf)
    val expect = StreamJoin.followWithinBatch(ev, "click", "purchase", 30)
      .select("first_id", "second_id").as[(Long, Long)].collect().toSet
    implicit val sqlCtx = spark.sqlContext
    val fIn = MemoryStream[First]
    val sIn = MemoryStream[Second]
    val joined = StreamJoin.followWithinStream(
      fIn.toDF(), sIn.toDF(), gapMinutes = 30)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("follow_stream_corpus").start()
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
      .as[(Long, Long, Timestamp)].collect()
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
      .as[(Long, Long, Timestamp)].collect()
    fIn.addData(clicks.map(c => First(c._1, c._2, c._3)).toSeq)
    sIn.addData(purchases.map(p => Second(p._1, p._2, p._3)).toSeq)
    q.processAllAvailable()
    val got = spark.table("follow_stream_corpus")
      .select("first_id", "second_id").as[(Long, Long)].collect().toSet
    q.stop()
    assert(got === expect)
  }
}
