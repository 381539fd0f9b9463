package graft

import org.apache.spark.sql.functions._

import graft.functions.RollingHash
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("hello world  foo", "a1b2!", "").toDF("text")
      .select(
        TextAnalysis.tokenCountWs(col("text")).as("ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("bpe"))
      .as[(Int, Int)].collect()
    assert(df(0) === ((3, 3)))
    // a1b2! -> [a][1][b][2][!] = 5 BPE-ish, 1 whitespace token
    assert(df(1) === ((1, 5)))
    assert(df(2) === ((0, 0)))
  }

  test("langId: argmax with fixed precedence on ties") {
    val df = Seq(
      "the a of the",            // en markers dominate
      "data table row column data", // data markers dominate
      "query join filter agg query join", // query markers
      "xyzzy")                   // no markers anywhere -> first profile wins
      .toDF("text")
      .select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(df.toSeq === Seq("en", "data", "query", "en"))
  }

  test("quality features bounded and deterministic") {
    val q = TextAnalysis.withQuality(Tables.documents(spark, sf))
    val rows = q.select("quality_score", "punct_ratio", "stopword_ratio")
      .as[(Double, Double, Double)].collect()
    assert(rows.forall { case (s, p, w) =>
      s >= 0 && s <= 1 && p >= 0 && p <= 1 && w >= 0 })
  }

  test("rolling hash: expression equals the reference implementation") {
    val texts = Seq("abc xyz", "", "the quick brown fox")
    val got = texts.toDF("t")
      .select(RollingHash.rolling_hash(col("t"))).as[Long].collect()
    val want = texts.map(t => RollingHash.hashBytes(t.getBytes("UTF-8")))
    assert(got.toSeq === want)
    // known vector (cross-checked against an independent implementation)
    assert(RollingHash.hashBytes("abc xyz".getBytes) === 591029166L)
  }

  test("fingerprints: md5 over normalized text, stable") {
    val fp = TextAnalysis.withFingerprints(
      Seq((1L, "a  b"), (2L, " a b ")).toDF("doc_id", "text"))
    val vals = fp.select("fp_md5", "fp_rolling")
      .as[(String, Long)].collect()
    assert(vals(0) === vals(1)) // both normalize to "a b"
  }

  test("token frequencies: tf/df counts and deterministic head order") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the the dog"),
      (3L, ""),                // no tokens
      (4L, "Cat! cat!")        // normalization lowercases; '!' kept (ws split)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenFrequencies(docs, topN = 3)
      .as[(String, Long, Long)].collect().toSeq
    // tf: the=3, cat!=2, cat=1, sat=1, dog=1 -> head: the, cat!, then
    // ties at tf=1 resolve alphabetically (cat)
    assert(got === Seq(("the", 3L, 2L), ("cat!", 2L, 1L), ("cat", 1L, 1L)))
  }

  test("distinctive terms: tf desc, df asc, token order; k bound") {
    val docs = Seq(
      (1L, "alpha alpha common"),
      (2L, "beta beta common"),
      (3L, "common gamma")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.distinctiveTerms(docs, k = 2)
      .orderBy(col("doc_id"), col("token"))
      .as[(Long, String, Long, Long)].collect().toSeq
    // doc 1: alpha(tf2) then common(tf1); doc 3: gamma (df=1) beats
    // common (df=3) at equal tf — the idf-monotone tiebreak
    assert(got === Seq(
      (1L, "alpha", 2L, 1L), (1L, "common", 1L, 3L),
      (2L, "beta", 2L, 1L), (2L, "common", 1L, 3L),
      (3L, "common", 1L, 3L), (3L, "gamma", 1L, 1L)))
  }
}
