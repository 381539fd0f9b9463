package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Long) = new Timestamp(1700000000000L + minute * 60000L)

  test("asOf: basic semantics — latest right row at or before each left row") {
    val trades = Seq(
      (1L, ts(10), "t1"),
      (1L, ts(20), "t2"),
      (1L, ts(5), "t0"),  // before any quote
      (2L, ts(10), "t3")) // key 2 has no quotes at all
      .toDF("key", "t", "trade")
    val quotes = Seq(
      (1L, ts(8), 100.0, 1L),
      (1L, ts(15), 101.0, 2L),
      (1L, ts(30), 102.0, 3L))
      .toDF("key", "qt", "price", "qid")
    val out = AsOf.asOf(trades, quotes, Seq("key"), "t", "qt",
        payload = Seq("price", "qid"), rightTieBreak = "qid")
      .select("trade", "asof_price", "asof_qid")
      .as[(String, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("t1") === ((Some(100.0), Some(1L)))) // quote@8 <= 10
    assert(out("t2") === ((Some(101.0), Some(2L)))) // quote@15 <= 20
    assert(out("t0") === ((None, None)))            // before first quote
    assert(out("t3") === ((None, None)))            // keyed LEFT join
  }

  test("asOf: equal timestamps are inclusive; right ties break by greatest") {
    val left = Seq((1L, ts(10), "e")).toDF("key", "t", "name")
    val right = Seq(
      (1L, ts(10), 7L, "low"),
      (1L, ts(10), 9L, "high")) // same instant: greatest tiebreak wins
      .toDF("key", "qt", "qid", "tag")
    val out = AsOf.asOf(left, right, Seq("key"), "t", "qt",
        payload = Seq("qid", "tag"), rightTieBreak = "qid")
      .select("asof_qid", "asof_tag").as[(Long, String)].collect()(0)
    assert(out === ((9L, "high")))
  }

  test("asOf: payload struct is atomic — null payload values do not mix rows") {
    val left = Seq((1L, ts(20), "e")).toDF("key", "t", "name")
    val right = Seq(
      (1L, ts(5), Some(100.0), "old"),
      (1L, ts(10), Option.empty[Double], "new")) // latest row has null price
      .toDF("key", "qt", "price", "tag")
    val out = AsOf.asOf(left, right, Seq("key"), "t", "qt",
        payload = Seq("price", "tag"), rightTieBreak = "tag")
      .select("asof_price", "asof_tag")
      .as[(Option[Double], String)].collect()(0)
    // both columns from the SAME (latest) row: price null, tag "new" —
    // a per-column last(ignoreNulls) would wrongly resurrect 100.0
    assert(out === ((None, "new")))
  }

  test("asOf: NULL keys never match (SQL ASOF equi-join parity)") {
    val left = Seq(
      (Option(1L), ts(10), "k1"),
      (Option.empty[Long], ts(10), "knull"))
      .toDF("key", "t", "name")
    val right = Seq(
      (Option(1L), ts(5), 100.0, 1L),
      (Option.empty[Long], ts(5), 999.0, 2L)) // must never be matched
      .toDF("key", "qt", "price", "qid")
    val out = AsOf.asOf(left, right, Seq("key"), "t", "qt",
        payload = Seq("price"), rightTieBreak = "qid")
      .select("name", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out.size === 2, "null-key left rows keep LEFT semantics")
    assert(out("k1") === Some(100.0))
    assert(out("knull") === None) // not matched to the null-key right row
  }

  test("asOf with no keys: global as-of join still works") {
    val left = Seq((ts(10), "e1"), (ts(3), "e0")).toDF("t", "name")
    val right = Seq((ts(5), 7.0), (ts(9), 9.0)).toDF("qt", "price")
    val out = AsOf.asOf(left, right, keys = Nil, "t", "qt",
        payload = Seq("price"), rightTieBreak = "price")
      .select("name", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out("e1") === Some(9.0))
    assert(out("e0") === None)
  }

  test("asOf on the events corpus matches an independent formulation") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    val got = AsOf.asOf(ev, purchases, Seq("user_id"), "ts", "ts",
        payload = Seq("purchase_id"), rightTieBreak = "purchase_id")
      .select($"event_id", $"asof_purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    // independent check on a sample: brute-force per event
    val evRows = ev.select($"event_id", $"user_id", $"ts", $"event_type")
      .as[(Long, Long, Timestamp, String)].collect()
    val byUser = evRows.groupBy(_._2)
    evRows.take(200).foreach { case (eid, uid, t, _) =>
      val expect = byUser(uid)
        .filter(r => r._4 == "purchase" && !r._3.after(t))
        .sortBy(r => (r._3.getTime, r._1)).lastOption.map(_._1)
      assert(got(eid) === expect, s"event $eid")
    }
  }
}
