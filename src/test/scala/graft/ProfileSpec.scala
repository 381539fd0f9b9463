package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, distincts, string extremes") {
    val df = Seq(
      (1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option("b")), (4L, Option("a"))
    ).toDF("id", "s")
    val got = Profile.profile(df, Seq("id", "s"), exact = true)
      .as[(String, Long, Long, Long, Long, String, String)]
      .collect().toSeq
    assert(got === Seq(
      ("id", 4L, 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 3L, 1L, 2L, "a", "b")))
  }

  test("approx profile: one scan, no Expand; estimates near exact") {
    val docs = Tables.documents(spark, sf)
    val df = Profile.profile(docs, Seq("doc_id", "lang", "source", "n_chars"))
    val pl = df.queryExecution.executedPlan.toString
    assert(!pl.contains("Expand"),
      s"approx profiling must not expand the input:\n$pl")
    assert(pl.split("\n").count(_.contains("Scan parquet")) === 1,
      "N-column profile must cost one scan")
    val approx = df.select("column_name", "n_distinct")
      .as[(String, Long)].collect().toMap
    val exact = Profile.profile(docs,
      Seq("doc_id", "lang", "source", "n_chars"), exact = true)
      .select("column_name", "n_distinct").as[(String, Long)].collect().toMap
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(math.abs(a - e).toDouble <= math.max(2.0, e * 0.1),
        s"$c: approx $a vs exact $e")
    }
  }
}
