package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDiff: all four statuses, by content fingerprint") {
    val old = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma")
    ).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "alpha"),          // unchanged
      (2L, "beta prime"),     // changed
      (4L, "delta")           // added; 3 removed
    ).toDF("doc_id", "text")
    val got = Snapshot.corpusDiff(old, cur)
      .select("doc_id", "status").as[(Long, String)].collect().toList
    assert(got === List(
      (1L, "unchanged"), (2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("corpusDiff: null fingerprints only on the absent side") {
    val old = Seq((1L, "x")).toDF("doc_id", "text")
    val cur = Seq((2L, "y")).toDF("doc_id", "text")
    val got = Snapshot.corpusDiff(old, cur)
      .select("doc_id", "old_md5", "new_md5", "status")
      .as[(Long, Option[String], Option[String], String)].collect().toList
    assert(got.map(r => (r._1, r._2.isDefined, r._3.isDefined, r._4)) ===
      List((1L, true, false, "removed"), (2L, false, true, "added")))
  }

  test("diffSummary: counts per status") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val cur = Seq((1L, "a"), (2L, "b2"), (3L, "c")).toDF("doc_id", "text")
    val got = Snapshot.diffSummary(Snapshot.corpusDiff(old, cur))
      .select("status", "n_docs").as[(String, Long)].collect().toMap
    assert(got === Map("unchanged" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("vocabDrift: one-sided tokens drift at their full rate, shared at zero") {
    val a = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val b = Seq((2L, "alpha gamma")).toDF("doc_id", "text")
    val got = Snapshot.vocabDrift(a, b, topK = 10)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // each side: 2 tokens, so every token's rate is 500000 ppm
    assert(got.map(_._1) === Seq("beta", "gamma", "alpha"),
      "drift desc then token asc must order the one-sided pair first")
    val byTok = got.map(r => r._1 -> r).toMap
    assert(byTok("beta") === (("beta", 1L, 0L, 500000L, 0L, 500000L)))
    assert(byTok("gamma") === (("gamma", 0L, 1L, 0L, 500000L, 500000L)))
    assert(byTok("alpha") === (("alpha", 1L, 1L, 500000L, 500000L, 0L)))
    // identical snapshots: zero drift everywhere
    val same = Snapshot.vocabDrift(a, a, topK = 10)
      .select("drift_ppm").as[Long].collect()
    assert(same.forall(_ === 0L))
  }
}
