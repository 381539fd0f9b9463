package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.sum

import graft.operators.{Dedup, Sessionize, Similarity, TextAnalysis}

/** Degenerate-input behavior: every operator must return empty/sane results
  * on empty or tiny inputs rather than throwing — partitions WILL be empty
  * at scale, and a 1000-executor job dying on a degenerate partition is a
  * production incident.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row], docSchema)

  test("dedup operators on an empty corpus return empty, no exceptions") {
    assert(Dedup.exactGroups(emptyDocs).count() === 0)
    assert(Dedup.minhashLshPairs(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() === 0)
    assert(Dedup.simhashPairs(emptyDocs).count() === 0)
  }

  test("clustering on empty / tiny corpora: no exceptions, sane shapes") {
    import graft.operators.Clustering
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], embSchema)
    assert(Clustering.kmeansSummary(spark, emptyEmb).count() === 0)
    assert(Clustering.kmeansAssign(emptyEmb).count() === 0)
    assert(Dedup.semanticDedupExact(emptyEmb).count() === 0)
    // corpus smaller than k: every vector seeds its own cluster; summary
    // has one row per SEED (k clamps to n), all vectors assigned
    val tiny = Seq(
      (1L, Array(0.5f, 0.5f)), (2L, Array(-0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val s = Clustering.kmeansSummary(spark, tiny, k = 8, iters = 2)
    assert(s.count() === 2)
    assert(s.agg(sum("n")).as[Long].head() === 2L)
    assert(Clustering.kmeansAssign(tiny, k = 8, iters = 2).count() === 2)
  }

  test("single-document corpus yields no pairs") {
    val one = Seq((1L, "only document here", "en", 18L))
      .toDF("doc_id", "text", "lang", "n_chars")
    assert(Dedup.minhashLshPairs(one).count() === 0)
    assert(Dedup.ngramJaccardPairs(one, threshold = 0.0).count() === 0)
  }

  test("null and empty text flow through text analysis") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, ""), (3L, "ok words"))
      .toDF("doc_id", "text")
    val q = TextAnalysis.withQuality(df).select("doc_id", "n_tokens")
      .as[(Long, Option[Int])].collect().toMap
    assert(q(1L) === None) // null text -> null metrics, not a crash
    assert(q(2L) === Some(0))
    assert(q(3L) === Some(2))
    // null text -> null fingerprint (matches the SQL oracle: md5(NULL)=NULL)
    val fp = TextAnalysis.withFingerprints(df)
      .filter($"doc_id" === 1L).select("fp_rolling")
      .as[Option[Long]].collect()
    assert(fp.toSeq === Seq(None))
  }

  test("top-k larger than the corpus returns the whole corpus ranked") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val top = Similarity.bruteForceTopK(emb, Seq(0L), k = 100000)
    assert(top.count() === n - 1) // everything except the query itself
  }

  test("sessionize on empty events returns no sessions") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("user_id", LongType),
        StructField("ts", TimestampType))))
    assert(Sessionize.batchSessions(empty).count() === 0)
  }

  test("router with zero routes sends everything to passthrough") {
    val r = new graft.operators.Router(Nil)
    val msgs = graft.model.Envelope.messagesFromEvents(Tables.events(spark, sf))
    val out = r.fanOut(msgs)
    assert(out.keySet === Set(graft.operators.Router.RawTable))
    assert(out(graft.operators.Router.RawTable).count() === msgs.count())
  }

  test("assembly operators on an empty corpus return empty, no exceptions") {
    import graft.operators.{Assembly, Curation}
    val splits = Seq("train" -> 0.8, "val" -> 0.2)
    assert(Assembly.hashSplit(emptyDocs, "doc_id", splits).count() === 0)
    assert(Assembly.stratifiedSample(emptyDocs, "lang", "doc_id", 1, 5)
      .count() === 0)
    assert(Assembly.weightedMix(emptyDocs, "lang", "doc_id",
      Map.empty, 0.5).count() === 0)
    assert(Assembly.weightedMixEpochs(emptyDocs, "lang", "doc_id",
      Map.empty, 2.5).count() === 0)
    assert(Assembly.globalShuffle(emptyDocs, "doc_id").count() === 0)
    assert(Curation.curate(emptyDocs).count() === 0)
  }

  test("stratified sample with num=0 keeps nothing; full fraction keeps all") {
    import graft.operators.Assembly
    val docs = Seq((1L, "a", "en", 1L), (2L, "b", "en", 1L),
      (3L, "c", "fr", 1L)).toDF("doc_id", "text", "lang", "n_chars")
    assert(Assembly.stratifiedSample(docs, "lang", "doc_id", 0, 5)
      .count() === 0)
    assert(Assembly.stratifiedSample(docs, "lang", "doc_id", 5, 5)
      .count() === 3)
  }

  test("interval join with no second-type events returns empty") {
    val ev = Seq((1L, 10L, new java.sql.Timestamp(0L), "click"))
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(graft.streaming.StreamJoin
      .followWithinBatch(ev, "click", "purchase", 30).count() === 0)
  }

  test("gopherQuality on empty/null/unicode text: zero-guarded, no exceptions") {
    val docs = Seq(
      (1L, ""), (2L, null.asInstanceOf[String]),
      (3L, "héllo wörld ünïcode the a of and or in text")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.gopherQuality(docs)
      .select("doc_id", "n_words", "mean_word_len", "pass_gopher")
      .collect()
    // empty text: all counts zero, fails word-count rule, no div-by-zero
    val empty = got.find(_.getLong(0) == 1L).get
    assert(empty.getLong(1) === 0L && empty.getDouble(2) === 0.0)
    assert(!empty.getBoolean(3))
    // null text propagates null counts without throwing; unicode words
    // count as words (non-whitespace runs) even when not [A-Za-z]-only
    val uni = got.find(_.getLong(0) == 3L).get
    assert(uni.getLong(1) === 10L)
  }

  test("spanDedup: empty and sub-k docs emit correct span counts") {
    val docs = Seq(
      (1L, ""), (2L, "one two three"),
      (3L, "one two three")  // exact dup of doc 2's single partial span
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.spanDedup(docs, k = 10)
      .select("doc_id", "n_spans", "n_kept").as[(Long, Long, Long)]
      .collect().toSeq
    // doc 1 has no words -> no spans -> no row (same as the oracle's
    // len(ws) > 0 guard); docs 2/3 dedupe on the partial span
    assert(got === Seq((2L, 1L, 1L), (3L, 1L, 0L)))
  }

  test("pii redact: null-safe and unicode-transparent") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      Option("mail ünïcode@exämple.com stays — non-ASCII local part"),
      Option("plain a@b.io goes"),
      Option.empty[String]
    ).toDF("text")
    val got = df.select(graft.operators.Pii.redact(col("text")))
      .as[Option[String]].collect().toSeq
    // pattern is ASCII-classed: the unicode address does NOT match in
    // either engine (dialect-identical behavior), the plain one does,
    // null stays null
    assert(got(0).get.contains("ünïcode@exämple.com"))
    assert(got(1).get === "plain <EMAIL> goes")
    assert(got(2).isEmpty)
  }

  test("round-8 operators on empty / degenerate inputs: no exceptions") {
    import java.sql.Timestamp
    import graft.operators.{Behavior, Graph, Pii}
    import org.apache.spark.sql.functions._
    val evSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val emptyEv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], evSchema)
    assert(Behavior.linearAttribution(emptyEv).count() === 0)
    assert(Behavior.ewmaTrend(emptyEv).count() === 0)
    assert(Pii.kAnonymityAudit(emptyEv,
      Seq(col("event_type")), col("user_id")).count() === 0,
      "no QI groups on an empty release candidate (k rows appear only " +
        "when groups exist)")
    // conversions with zero touches: empty credit table, not a crash
    val convOnly = Seq((1L, 1L, new Timestamp(0L), "purchase", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(Behavior.linearAttribution(convOnly).count() === 0)
    // empty graph: empty k-core and link scores
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("src", LongType),
        StructField("dst", LongType))))
    assert(Graph.kCore(emptyPairs, 2).count() === 0)
    assert(Graph.commonNeighborScores(emptyPairs).count() === 0)
    // PMI on an empty corpus
    assert(TextAnalysis.pmiPairs(emptyDocs).count() === 0)
  }

  test("text index on degenerate corpora: empty build serves empty, " +
      "all-empty-text docs index as zero postings, oversized phrases " +
      "and unknown terms return empty") {
    import graft.sinks.Sink
    val dir = java.nio.file.Files.createTempDirectory("textidx_edge")
      .toString
    try {
      // EMPTY corpus: build succeeds (N=0, T=0), every retrieval form
      // returns empty rather than throwing — an index over a filtered-
      // to-nothing slice is a legitimate state
      Sink.writeTextIndex(
        emptyDocs.select($"doc_id", $"text"), dir, buckets = 8)
      val idx = Sink.readTextIndex(spark, dir)
      assert(idx.nDocs === 0L && idx.totalTokens === 0L)
      assert(TextAnalysis.bm25TopK(idx, Seq("anything")).count() === 0)
      assert(TextAnalysis.phraseTopK(idx, Seq("a", "b")).count() === 0)
      assert(TextAnalysis.proximityTopK(idx, Seq("a", "b")).count() === 0)
      assert(Sink.textOccupancyDrift(spark, dir).count() === 0,
        "empty index censuses as empty, not an exception")
      // whitespace-only / empty text tokenizes to NOTHING: docs index
      // with zero postings, N counts them, dl sums stay zero-guarded
      Sink.writeTextIndex(
        Seq((1L, ""), (2L, "   "), (3L, "real words here"))
          .toDF("doc_id", "text"), dir, buckets = 8)
      val idx2 = Sink.readTextIndex(spark, dir)
      assert(idx2.nDocs === 3L && idx2.totalTokens === 3L)
      assert(TextAnalysis.bm25TopK(idx2, Seq("real"))
        .as[(Long, Long)].collect().map(_._1).toSeq === Seq(3L))
      // a phrase longer than every document cannot match
      assert(TextAnalysis.phraseTopK(idx2,
        Seq("real", "words", "here", "overflow")).count() === 0)
      // unknown terms: conjunctive forms return empty, not errors
      assert(TextAnalysis.proximityTopK(idx2,
        Seq("real", "zzz_unknown")).count() === 0)
      assert(TextAnalysis.snippetTopK(idx2,
        Seq((1L, ""), (2L, "   "), (3L, "real words here"))
          .toDF("doc_id", "text"),
        Seq("zzz_unknown")).count() === 0)
      // snippet on a one-term hit slices exactly that token
      val snip = TextAnalysis.snippetTopK(idx2,
        Seq((1L, ""), (2L, "   "), (3L, "real words here"))
          .toDF("doc_id", "text"),
        Seq("words")).as[(Long, Long, Long, String)].collect().toSeq
      assert(snip === Seq((3L, 1L, 1L, "words")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("PQ on a corpus smaller than the codebook clamps, does not crash") {
    // 3 vectors < kCodes=16: seeds clamp to 3 — table sizing must follow
    // the TRAINED codebook, not the parameter (the kEff contract)
    val tiny = Seq(
      (1L, Array.fill(64)(0.1f), 0),
      (2L, Array.fill(64)(-0.2f), 0),
      (3L, Array.fill(64)(0.3f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.pqTopK(tiny, nProbes = 2, topK = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (p, _, v, _) => p != v })
    assert(r.groupBy(_._1).forall(_._2.length <= 2))
  }
}
