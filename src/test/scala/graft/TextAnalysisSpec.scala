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

  test("gramHashes ≡ wordGrams: sizes, multiplicity, distincts — incl. punctuation") {
    val docs = Seq(
      (1L, "the quick brown fox the quick brown fox"),
      (2L, "a.b,c!!d  e-f"),        // punctuation runs are separators
      (3L, "one two"),              // shorter than n for n=3,5
      (4L, ""), (5L, "repeat repeat repeat repeat")
    ).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5)) {
      val viaStrings = docs.select(
        col("doc_id"),
        size(TextAnalysis.wordGrams(TextAnalysis.wordArray(col("text")), n)).as("sz"),
        size(array_distinct(
          TextAnalysis.wordGrams(TextAnalysis.wordArray(col("text")), n))).as("dsz"))
        .orderBy("doc_id").as[(Long, Int, Int)].collect().toSeq
      val viaHashes = docs.select(
        col("doc_id"),
        size(TextAnalysis.gramHashes(col("text"), n)).as("sz"),
        size(array_distinct(TextAnalysis.gramHashes(col("text"), n))).as("dsz"))
        .orderBy("doc_id").as[(Long, Int, Int)].collect().toSeq
      assert(viaHashes === viaStrings, s"n=$n")
    }
    // per-gram multiplicity: the mode count agrees between forms
    val topViaStrings = docs
      .select(col("doc_id"),
        explode(TextAnalysis.wordGrams(TextAnalysis.wordArray(col("text")), 2)).as("g"))
      .groupBy("doc_id", "g").count().groupBy("doc_id")
      .agg(max("count")).orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val topViaHashes = docs
      .select(col("doc_id"), explode(TextAnalysis.gramHashes(col("text"), 2)).as("g"))
      .groupBy("doc_id", "g").count().groupBy("doc_id")
      .agg(max("count")).orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(topViaHashes === topViaStrings)
  }

  test("gopherQuality: per-rule flags on constructed edge docs") {
    val docs = Seq(
      // 25 words, mean len ok, stopwords present → passes everything
      (1L, ("the a of and " + Seq.fill(21)("token").mkString(" "))),
      // too short (3 words)
      (2L, "the a of"),
      // symbol-heavy: ellipses push symbol_ratio over 0.1
      (3L, ("the a of and " + Seq.fill(21)("wait ...").mkString(" "))),
      // numeric soup: alpha ratio below 0.8
      (4L, ("the a of and " + Seq.fill(30)("12345").mkString(" "))),
      // no stopwords at all
      (5L, Seq.fill(30)("zzz").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQuality(docs, minWords = 20, maxWords = 80)
      .orderBy(col("doc_id"))
      .select("pass_gopher", "flag_word_count", "flag_symbols",
        "flag_alpha", "flag_stopwords")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got(0) === ((true, true, true, true, true)))
    assert(!got(1)._2, "3 words must fail the word-count band")
    assert(!got(2)._3, "ellipsis soup must fail the symbol-ratio rule")
    assert(!got(3)._4, "numeric soup must fail the alpha-word rule")
    assert(!got(4)._5, "stopword-free text must fail the stopword rule")
    assert(got.tail.forall(!_._1), "any failed rule fails the conjunction")
  }

  test("gopherQuality on the corpus: both branches populated, ratios bounded") {
    val df = TextAnalysis.gopherQuality(
      Tables.documents(spark, sf), minWords = 20, maxWords = 80)
    val rows = df.select("pass_gopher", "mean_word_len", "symbol_ratio",
      "alpha_word_ratio").as[(Boolean, Double, Double, Double)].collect()
    assert(rows.exists(_._1) && rows.exists(!_._1),
      "thresholds must split the synthetic corpus")
    assert(rows.forall(r => r._3 >= 0 && r._3 <= 1 && r._4 >= 0 && r._4 <= 1))
  }

  test("classifierScore: hand-computed hashed-feature logits") {
    // md5("a") = 0cc175... -> 0x0cc1 = 3265; 3265 % 997 = 274; -498 -> -224
    // md5("b") = 92eb5f... -> 0x92eb = 37611; 37611 % 997 = 722; -498 -> +224
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "a b"), (4L, "b b a"), (5L, "  !! ")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.classifierScore(docs)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, -224L, false),
      (2L, 1L, 224L, true),
      (3L, 2L, 0L, false),    // boundary is strict: logit > 0
      (4L, 3L, 224L, true),
      (5L, 0L, 0L, false)))   // wordless doc: zero-feature fold
  }

  test("lmScore: hand-computed integer bigram masses") {
    // doc 3 tokenizes through the '...' separator: [a, b, a, c] ->
    // grams "a b", "b a", "a c".
    // corpus c2: "a b"=3 (docs 1,2,3), "b c"=1, "b a"=1, "a c"=1
    // histories: c1(a) = 3+1 = 4; c1(b) = 1+1 = 2
    // weights: w("a b") = 3e6 div 4 = 750000; w("b c") = 1e6 div 2 =
    // 500000; w("b a") = 500000; w("a c") = 1e6 div 4 = 250000
    val docs = Seq(
      (1L, "a b"),            // 750000, n 1
      (2L, "a b c"),          // 750000+500000, n 2 -> avg 625000
      (3L, "a b ... a c"),    // 750000+500000+250000, n 3 -> avg 500000
      (4L, "solo"),           // 1 word: zero bigrams
      (5L, "")                // empty
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 750000L, 750000L),
      (2L, 2L, 1250000L, 625000L),
      (3L, 3L, 1500000L, 500000L),
      (4L, 0L, 0L, 0L),
      (5L, 0L, 0L, 0L)))
  }

  test("searchTopK: hand-computed conjunctive tf-idf ranking") {
    // N = 4. df(x) = 3, df(y) = 2.
    // idf(x) = ((4-3+1)*1e6) div 4 = 500000
    // idf(y) = ((4-2+1)*1e6) div 3 = 1000000
    val docs = Seq(
      (1L, "x y"),        // 500000 + 1000000 = 1500000
      (2L, "x x y"),      // 1000000 + 1000000 = 2000000
      (3L, "x z"),        // missing y -> excluded
      (4L, "w w w")       // missing both -> excluded
    ).toDF("doc_id", "text")
    val got = TextAnalysis.searchTopK(docs, Seq("x", "y"), k = 5)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, 2000000L), (1L, 1500000L)))
  }

  test("searchTopK: conjunctive gate and deterministic cut on the corpus") {
    val docs = Tables.documents(spark, sf)
    val terms = Seq("vector", "hash", "merge")
    val got = TextAnalysis.searchTopK(docs, terms, k = 20)
      .as[(Long, Long)].collect().toSeq
    assert(got.nonEmpty && got.size <= 20)
    // scores non-increasing, doc_id ascending within equal scores
    assert(got.sliding(2).forall {
      case Seq((d1, s1), (d2, s2)) => s1 > s2 || (s1 == s2 && d1 < d2)
      case _ => true
    })
    // every hit really contains every term
    val hitIds = got.map(_._1).toSet
    val texts = docs.filter(col("doc_id").isin(hitIds.toSeq: _*))
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.forall { case (_, t) =>
      val toks = t.toLowerCase.split("\\s+").toSet
      terms.forall(toks.contains)
    })
  }

  test("lmScore: degenerate all-one-head corpus takes no per-key sort") {
    // every bigram shares head word "the": the former window form would
    // funnel ALL gram types onto one reducer for a WindowExec sort; the
    // groupBy+join form has no Window/per-key sort anywhere in the plan
    val docs = (1 to 200).map(i => (i.toLong, s"the w$i")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no WindowExec expected:\n$plan")
    // correctness on the degenerate shape: every bigram unique under one
    // head -> c2 = 1, c1 = 200 -> weight = 1e6 div 200 = 5000 each
    val rows = got.as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows === (1 to 200).map(i => (i.toLong, 1L, 5000L, 5000L)))
  }

  test("lmScore: total audit over the corpus, bounded averages") {
    val docs = Tables.documents(spark, sf)
    val got = TextAnalysis.lmScore(docs)
    assert(got.count() === docs.count(), "every doc keeps a row")
    val rows = got.as[(Long, Long, Long, Long)].collect()
    // avg per transition is a scaled probability: 0 <= avg <= 1e6
    assert(rows.forall { case (_, n, mass, avg) =>
      avg >= 0L && avg <= 1000000L && (n > 0L || (mass == 0L && avg == 0L))
    })
    // identical docs score identically (model is content-derived)
    val twin = TextAnalysis.lmScore(docs.repartition(7))
      .as[(Long, Long, Long, Long)].collect()
    assert(twin.sorted.toSeq === rows.sorted.toSeq,
      "score must not depend on partition layout")
  }

  test("readability: exact integer counts and permille formula") {
    val docs = Seq(
      (1L, "The cat sat. It ran!"),       // 5 words, 2 sents, 5 vowel groups
      (2L, ""),                            // degenerate: all guards to 1
      (3L, "xz"))                          // 1 word, 0 sents, 0 syllables
      .toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId(1L) === ((1L, 5L, 2L, 5L, 2500L, 1000L,
      // 206835 - 1015*2500/1000 - 84600*1000/1000
      206835L - (1015L * 2500L) / 1000L - 84600L)))
    assert(byId(2L) === ((2L, 0L, 0L, 0L, 0L, 0L, 206835L)))
    assert(byId(3L) === ((3L, 1L, 0L, 0L, 1000L, 0L,
      206835L - (1015L * 1000L) / 1000L)))
  }

  test("dupGramFraction: shared 5-grams counted, uniques not, total audit") {
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared zeta"),     // grams: shared(1..2): 2 grams, both... see below
      (2L, s"$shared eta"),
      (3L, "one two three four five six"),
      (4L, "short doc"))          // < 5 words: zero grams, stays in output
      .toDF("doc_id", "text")
    // doc1 grams: [alpha..epsilon], [beta..zeta]; doc2: [alpha..epsilon],
    // [beta..eta] -> the first gram is shared (df=2), second unique each
    val r = TextAnalysis.dupGramFraction(docs)
      .as[(Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 2L, 1L, 500L)))
    assert(r(2L) === ((2L, 2L, 1L, 500L)))
    assert(r(3L) === ((3L, 2L, 0L, 0L)))
    assert(r(4L) === ((4L, 0L, 0L, 0L)))
  }

  test("pmiPairs: presence (not tf) drives df, exact ppm ratio, ordering") {
    // d1 repeats x — presence counts once; N = 4, df x=3 y=2 z=1 w=1
    val docs = Seq((1L, "x x y"), (2L, "x y"), (3L, "x z"), (4L, "w"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.pmiPairs(docs, minDf = 1L, minPairDf = 1L)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5))).toSeq
    // (x,y): 2·1e6·4 / (3·2) = 1333333 (floor); (x,z): 1·1e6·4 / 3
    assert(r === Seq(
      ("x", "y", 2L, 3L, 2L, 1333333L),
      ("x", "z", 1L, 3L, 1L, 1333333L)))
    // minDf prunes z before the pair join
    val r2 = TextAnalysis.pmiPairs(docs, minDf = 2L, minPairDf = 1L)
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(r2 === Seq(("x", "y")))
  }

  test("textRankKeywords: the co-occurrence hub ranks first, ties by token") {
    // hub co-occurs with both b and c; b and c never co-occur — the
    // hub's mass must dominate, b/c get equal mass and tie by token
    val docs = ((1 to 3).map(i => (i.toLong, "hub b")) ++
      (4 to 6).map(i => (i.toLong, "hub c"))).toDF("doc_id", "text")
    val r = TextAnalysis.textRankKeywords(docs,
      minDf = 1L, minPairDf = 1L, iterations = 5, topK = 10)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      .toSeq
    assert(r.map(_._1) === Seq("hub", "b", "c"))
    assert(r.map(_._3) === Seq(1L, 2L, 3L))
    assert(r(0)._2 > r(1)._2, "hub mass must dominate")
    assert(r(1)._2 === r(2)._2, "symmetric leaves carry equal mass")
  }
}
