package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketedRangeJoin: containment inclusive at both ends, keyed") {
    val points = Seq(
      (1L, 100L, "p_in"),
      (1L, 50L, "p_at_start"),
      (1L, 200L, "p_at_end"),
      (1L, 201L, "p_after"),
      (2L, 100L, "p_wrong_key"))
      .toDF("key", "t", "name")
    val intervals = Seq(
      (1L, 50L, 200L, "w1"))
      .toDF("key", "s", "e", "wname")
    val out = RangeJoin.bucketedRangeJoin(points, intervals,
        Seq("key"), "t", "s", "e", bucketWidthUs = 30L)
      .select("name", "wname").as[(String, String)].collect().toSet
    assert(out === Set(
      ("p_in", "w1"), ("p_at_start", "w1"), ("p_at_end", "w1")))
  }

  test("bucketedRangeJoin: each qualifying pair appears exactly once " +
      "even when the interval spans many buckets") {
    val points = Seq((1L, 500L, "p")).toDF("key", "t", "name")
    val intervals = Seq((1L, 0L, 1000L, "wide")).toDF("key", "s", "e", "w")
    // width 10 → interval covers 101 buckets; the point still matches once
    val out = RangeJoin.bucketedRangeJoin(points, intervals,
      Seq("key"), "t", "s", "e", bucketWidthUs = 10L)
    assert(out.count() === 1)
  }

  test("bucketedRangeJoin matches a brute-force non-equi join on the corpus") {
    val ev = Tables.events(spark, sf).withColumn("t_us", unix_micros(col("ts")))
    val pts = ev.select(col("user_id"), col("event_id"), col("t_us"))
    val ws = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), (col("t_us") - 300000000L).as("s"),
        (col("t_us") + 300000000L).as("e"))
    val bucketed = RangeJoin.bucketedRangeJoin(
        pts, ws, Seq("user_id"), "t_us", "s", "e", 600000000L)
      .groupBy("event_id").count().as[(Long, Long)].collect().toMap
    val brute = pts.as("p").join(ws.as("w"),
        col("p.user_id") === col("w.user_id") &&
          col("p.t_us") >= col("w.s") && col("p.t_us") <= col("w.e"))
      .groupBy("event_id").count().as[(Long, Long)].collect().toMap
    assert(bucketed === brute)
    assert(brute.nonEmpty)
  }
}
