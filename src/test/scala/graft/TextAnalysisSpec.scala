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
}
