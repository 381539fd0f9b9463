package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Assembly, TextAnalysis, Urls}

/** Round-6 additions: URL canonicalization/dedup, classifier PR-curve
  * calibration, curriculum ordering, OOV-rate audit.
  */
class UrlsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ canonicalize

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(Urls.canonicalize(col("url")).as("c"))
      .as[String].collect().toSeq

  test("canonicalize: case, www, default port, trailing slash, fragment") {
    assert(canon("HTTPS://WWW.Site.COM:443/a/b/?x=1#frag")
      === Seq("https://site.com/a/b?x=1"))
    assert(canon("http://site.com:80/") === Seq("http://site.com/"))
    assert(canon("https://site.com") === Seq("https://site.com/"))
  }

  test("canonicalize: utm params dropped, remaining params sorted") {
    assert(canon("https://s.com/p?utm_source=x&b=2&a=1")
      === Seq("https://s.com/p?a=1&b=2"))
    // all params are tracking params -> query dropped entirely
    assert(canon("https://s.com/p?utm_a=1&utm_b=2") === Seq("https://s.com/p"))
  }

  test("canonicalize: non-default port and deep path survive") {
    assert(canon("https://s.com:8443/a//b///")
      === Seq("https://s.com:8443/a//b"))
  }

  test("canonicalize: equivalent variants collapse, distinct ones do not") {
    val variants = Seq(
      "https://www.site.com/docs/1",
      "HTTPS://SITE.com:443/docs/1/",
      "https://site.com/docs/1?utm_campaign=z#top")
    assert(canon(variants: _*).distinct === Seq("https://site.com/docs/1"))
    assert(canon("https://site.com/docs/1?id=2").head
      !== "https://site.com/docs/1")
  }

  // ---------------------------------------------------------- urlDedup

  private def urlDocs(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("doc_id", "url", "n_chars")

  test("urlDedup: keeper is (n_chars desc, doc_id) head; n_dups counts group") {
    val d = urlDocs(
      (1L, "https://www.a.com/x", 10L),
      (2L, "HTTPS://a.com:443/x/", 30L),
      (3L, "https://a.com/x#f", 30L),
      (4L, "https://b.com/y", 5L))
    val out = Urls.urlDedup(d, col("url"))
      .select("doc_id", "canonical_url", "n_dups")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out === Seq(
      (2L, "https://a.com/x", 3L), (4L, "https://b.com/y", 1L)))
  }

  test("urlDedup: survivors are unique per canonical key, multiplicity conserved") {
    val d = Tables.documents(spark, sf)
      .withColumn("url", concat(lit("https://WWW."), col("source"),
        lit(".com:443/d/"), (col("doc_id") % 10).cast("string"),
        lit("/?utm_x=1")))
    val out = Urls.urlDedup(d, col("url"))
    assert(out.groupBy("canonical_url").count().filter(col("count") > 1).count() === 0)
    assert(out.agg(sum("n_dups")).as[Long].head === d.count())
  }

  // ------------------------------------------------- classifierPrCurve

  test("classifierPrCurve: confusion counts partition N and agree with direct counts") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val out = TextAnalysis.classifierPrCurve(
      docs, col("n_chars") >= 300L, Seq(-100L, 0L, 100L))
    val rows = out.select("threshold", "tp", "fp", "fn", "tn")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.size === 3)
    rows.foreach { case (_, tp, fp, fn, tn) => assert(tp + fp + fn + tn === n) }
    // positives count is threshold-invariant
    assert(rows.map { case (_, tp, _, fn, _) => tp + fn }.distinct.size === 1)
    // predicted-positive count is non-increasing in the threshold
    val predPos = rows.sortBy(_._1).map { case (_, tp, fp, _, _) => tp + fp }
    assert(predPos === predPos.sorted.reverse)
    // spot-check one cell against a direct computation
    val direct = TextAnalysis.classifierScore(docs)
      .join(docs.select(col("doc_id"), (col("n_chars") >= 300L).as("y")), "doc_id")
      .filter(col("logit") >= 0L && col("y")).count()
    assert(rows.find(_._1 == 0L).get._2 === direct)
  }

  test("classifierPrCurve: ratio columns match their integer definitions") {
    val out = TextAnalysis.classifierPrCurve(
      Tables.documents(spark, sf), col("n_chars") >= 300L, Seq(0L))
      .select("tp", "fp", "fn", "precision", "recall", "f1")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    val (tp, fp, fn, p, r, f1) = out
    assert(p === tp.toDouble / (tp + fp))
    assert(r === tp.toDouble / (tp + fn))
    assert(f1 === 2.0 * tp / (2 * tp + fp + fn))
  }

  // ------------------------------------------------- curriculumOrder

  test("curriculumOrder: rank is a dense 1..N permutation matching row_number") {
    val docs = Tables.documents(spark, sf)
    val out = Assembly.curriculumOrder(docs, expr("n_chars div 100"))
    val n = docs.count()
    assert(out.count() === n)
    assert(out.agg(min("rank"), max("rank"), countDistinct("rank"))
      .as[(Long, Long, Long)].head() === ((1L, n, n)))
    // equals the sequential definition
    val seq = docs.select(col("doc_id"), expr("n_chars div 100").as("difficulty"),
        md5(concat(lit("curriculum"), col("doc_id").cast("string")).cast("binary")).as("tie"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("difficulty"), col("tie"), col("doc_id"))).cast("long"))
      .select("doc_id", "rank")
    assert(out.select("doc_id", "rank").except(seq).count() === 0)
  }

  test("curriculumOrder: difficulty bands are contiguous in rank order") {
    val out = Assembly.curriculumOrder(
      Tables.documents(spark, sf), expr("n_chars div 100"))
      .orderBy("rank").select("difficulty").as[Long].collect().toSeq
    assert(out === out.sorted)
  }

  test("curriculumOrder: deterministic under input repartitioning") {
    val d = Tables.documents(spark, sf)
    val a = Assembly.curriculumOrder(d, expr("n_chars div 100"))
      .collect().toSet
    val b = Assembly.curriculumOrder(d.repartition(13), expr("n_chars div 100"))
      .collect().toSet
    assert(a === b)
  }

  // ------------------------------------------------------- oovAudit

  test("oovAudit: hand-computed coverage on a tiny corpus") {
    // vocab(2) by (freq desc, token): "b"(4), "a"(3); OOV: "c","d"
    val d = Seq(
      (1L, "a b b"), (2L, "a b c"), (3L, "a b d c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovAudit(d, vocabSize = 2)
      .select("doc_id", "n_tokens", "n_invocab", "n_oov")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((1L, 3L, 3L, 0L), (2L, 3L, 2L, 1L), (3L, 4L, 2L, 2L)))
  }

  test("oovAudit: full vocab means zero OOV; zero vocab means all OOV") {
    val docs = Tables.documents(spark, sf)
    val all = TextAnalysis.oovAudit(docs, vocabSize = 1000)
    assert(all.agg(sum("n_oov")).as[Long].head === 0L)
    val none = TextAnalysis.oovAudit(docs, vocabSize = 0)
    assert(none.filter(col("n_invocab") =!= 0L).count() === 0L)
  }

  // ---------------------------------------------------- tokenizeToIds

  test("tokenizeToIds: hand-computed ids, positions, and UNK mapping") {
    // vocab(2) by (freq desc, token): "b"(4)->1, "a"(3)->2; "c","d"->0
    val d = Seq((1L, "a b b"), (2L, "a b c"), (3L, "a b d c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenizeToIds(d, vocabSize = 2)
      .select("doc_id", "pos", "token_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 2L), (1L, 1L, 1L), (1L, 2L, 1L),
      (2L, 0L, 2L), (2L, 1L, 1L), (2L, 2L, 0L),
      (3L, 0L, 2L), (3L, 1L, 1L), (3L, 2L, 0L), (3L, 3L, 0L)))
  }

  test("tokenizeToIds: id count consistent with oovAudit; encode join broadcasts") {
    val docs = Tables.documents(spark, sf)
    val enc = TextAnalysis.tokenizeToIds(docs, 20)
    val oov = TextAnalysis.oovAudit(docs, 20)
    val encOov = enc.filter(col("token_id") === 0L)
      .groupBy("doc_id").count()
      .join(oov, "doc_id")
      .filter(col("count") =!= col("n_oov"))
    assert(encOov.count() === 0)
    val pl = enc.queryExecution.executedPlan.toString
    assert(pl.contains("BroadcastHashJoin"), s"expected broadcast vocab:\n$pl")
  }

  // ---------------------------------------------------- plan receipts

  test("plan: oovAudit broadcasts the vocab into the coverage join") {
    val pl = TextAnalysis.oovAudit(Tables.documents(spark, sf), 20)
      .queryExecution.executedPlan.toString
    assert(pl.contains("BroadcastHashJoin"), s"expected broadcast vocab:\n$pl")
    assert(pl.contains("TakeOrderedAndProject"),
      s"expected heap-based top-V vocab cut, not a global sort:\n$pl")
  }

  test("plan: classifierPrCurve has no per-row window or single-partition funnel before the agg") {
    val pl = TextAnalysis.classifierPrCurve(
      Tables.documents(spark, sf), col("n_chars") >= 300L, Seq(0L, 100L))
      .queryExecution.executedPlan.toString
    assert(!pl.contains("Window"), s"unexpected window:\n$pl")
  }

  // ------------------------------------------- streaming URL dedup twin

  test("streaming URL dedup: canonical-key dropDuplicatesWithinWatermark") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val deduped = in.toDF().toDF("doc_id", "url", "ts")
      .withColumn("canonical_url", Urls.canonicalize(col("url")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("canonical_url")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("url_dedup_stream").start()
    def t(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)
    in.addData(
      (1L, "https://www.a.com/x", t(0)),
      (2L, "HTTPS://a.com:443/x/#f", t(1)),   // canonical dup of 1
      (3L, "https://a.com/x?id=1", t(2)))     // distinct (query param)
    q.processAllAvailable()
    in.addData((4L, "https://a.com/x?utm_s=1", t(3))) // dup of 1 again
    q.processAllAvailable()
    val kept = spark.table("url_dedup_stream")
      .select("doc_id").as[Long].collect().toSet
    q.stop()
    assert(kept === Set(1L, 3L))
  }
}
