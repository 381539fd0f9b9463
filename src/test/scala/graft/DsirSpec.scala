package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two dialects: docs 0-3 speak "alpha beta", docs 4-9 speak "gamma delta";
  // target slice = the first two alpha-docs
  private def corpus() = Seq(
    (0L, "alpha beta alpha beta alpha beta"),
    (1L, "alpha beta alpha beta"),
    (2L, "alpha beta gamma delta"),
    (3L, "alpha beta"),
    (4L, "gamma delta gamma delta"),
    (5L, "gamma delta"),
    (6L, "gamma delta gamma delta gamma delta"),
    (7L, "gamma delta"),
    (8L, "gamma delta"),
    (9L, "x")).toDF("doc_id", "text")

  test("target-resembling docs outrank the rest; every doc keeps a row") {
    val out = Curation.dsirSelect(corpus(), isTarget = col("doc_id") <= 1,
      buckets = 64, k = 4)
    val rows = out.select("doc_id", "dsir_score", "selected")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(rows.size === 10)
    assert(rows.count(_._3) === 4)
    // the alpha-dialect docs (sharing the target's bigram buckets) are
    // exactly the selected set
    assert(rows.filter(_._3).map(_._1).toSet === Set(0L, 1L, 2L, 3L))
    // wordless doc scores zero but is still present
    assert(rows.find(_._1 == 9L).get._2 === 0L)
  }

  test("selected is the exact top-k cut under (score desc, doc_id)") {
    val out = Curation.dsirSelect(corpus(), col("doc_id") <= 1,
      buckets = 64, k = 4)
      .select("doc_id", "dsir_score", "selected")
      .as[(Long, Long, Boolean)].collect().toSeq
    val expect = out.sortBy { case (d, s, _) => (-s, d) }
      .take(4).map(_._1).toSet
    assert(out.filter(_._3).map(_._1).toSet === expect)
  }

  test("ties at the k-th score break by doc_id, keeping |selected| == k") {
    // docs 5,7,8 are identical ("gamma delta") -> tied scores; k cuts
    // through the tie and doc_id decides membership
    val out = Curation.dsirSelect(corpus(), col("doc_id") <= 1,
      buckets = 64, k = 6)
      .select("doc_id", "dsir_score", "selected")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.count(_._3) === 6)
    val expect = out.sortBy { case (d, s, _) => (-s, d) }.take(6).map(_._1).toSet
    assert(out.filter(_._3).map(_._1).toSet === expect)
  }

  test("GramBucketsExpr equals the composable md5-conv pipeline") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val ws = graft.operators.TextAnalysis.wordArray(col("text"))
    val composable = flatten(array(transform(
      graft.operators.TextAnalysis.wordGrams(ws, 2),
      g => (conv(substring(md5(g), 1, 4), 16, 10).cast("long") % 64))))
    val native = graft.functions.GramBuckets.gram_buckets(
      graft.operators.TextAnalysis.normWords(col("text")), 2, 64)
    val diff = docs.select(col("doc_id"), composable.as("a"), native.as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(diff === 0L)
  }

  test("deterministic under repartition") {
    val a = Curation.dsirSelect(corpus().repartition(5), col("doc_id") <= 1,
      buckets = 64, k = 4).collect().toSeq
    val b = Curation.dsirSelect(corpus().repartition(2), col("doc_id") <= 1,
      buckets = 64, k = 4).collect().toSeq
    assert(a === b)
  }
}
