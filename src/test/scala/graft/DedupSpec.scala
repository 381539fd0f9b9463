package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  lazy val synthetic = Seq(
    (1L, "the quick brown fox", "en"),
    (2L, "The  quick brown FOX", "en"), // dup of 1 after normalization
    (3L, "something else entirely", "en"),
    (4L, "the quick brown fox", "fr")) // dup of 1
    .toDF("doc_id", "text", "lang")

  test("exactGroups: normalized duplicates collapse, min doc_id survives") {
    val g = Dedup.exactGroups(synthetic).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(g === Map(1L -> 3L, 3L -> 1L))
  }

  test("exactDedup keeps one row per content") {
    val kept = Dedup.exactDedup(synthetic).select("doc_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("wordShingles produces distinct w-grams") {
    val sh = synthetic.filter($"doc_id" === 1)
      .select(Dedup.wordShingles(col("text"), 3))
      .as[Seq[String]].collect()(0)
    assert(sh.toSet === Set("the quick brown", "quick brown fox"))
  }

  test("minhash signature is deterministic and length-k") {
    val sig = docs.limit(5)
      .select(Dedup.minhashSignature(Dedup.wordShingles(col("text")), 64))
      .as[Seq[Long]].collect()
    assert(sig.forall(_.length === 64))
    val sig2 = docs.limit(5)
      .select(Dedup.minhashSignature(Dedup.wordShingles(col("text")), 64))
      .as[Seq[Long]].collect()
    assert(sig.toSeq === sig2.toSeq)
  }

  test("minhash LSH finds the high-jaccard pairs (recall vs exact, t=0.8)") {
    // exact ground truth via blocked all-pairs (small corpus)
    val g = docs.select(col("doc_id"), Dedup.wordShingles(col("text")).as("sh"))
    val a = g.select(col("doc_id").as("da"), col("sh").as("sa"))
    val b = g.select(col("doc_id").as("db"), col("sh").as("sb"))
    val exact = a.crossJoin(b).filter(col("da") < col("db"))
      .select(col("da"), col("db"), Dedup.jaccard(col("sa"), col("sb")).as("j"))
      .filter(col("j") >= 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    // at t=0.8 with 16 bands × 4 rows the s-curve gives ~99.98% recall
    assert((exact -- lsh).isEmpty, s"LSH missed pairs: ${exact -- lsh}")
    // verification step guarantees no false positives
    assert((lsh -- exact).isEmpty)
  }

  test("wordShingleJaccardPairs: banded-exact equals brute force; LSH audit claims hold") {
    // brute-force ground truth over the SAME shingle space
    val g = docs.select(col("doc_id"), Dedup.wordShingles(col("text")).as("sh"))
    val a = g.select(col("doc_id").as("da"), col("sh").as("sa"))
    val b = g.select(col("doc_id").as("db"), col("sh").as("sb"))
    val brute = a.crossJoin(b).filter(col("da") < col("db"))
      .select(col("da"), col("db"), Dedup.jaccard(col("sa"), col("sb")).as("j"))
      .filter(col("j") >= 0.8)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val banded = Dedup.wordShingleJaccardPairs(docs, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded === brute, "banded-exact must be COMPLETE, not approximate")
    // the registered audit's claims on this corpus
    val audit = SparkEntry.queries("dedup_minhash")(spark, sf)
      .as[(Long, Boolean, Boolean)].collect()
    assert(audit.length === 1)
    val (nExact, recallOk, noFp) = audit.head
    assert(nExact === brute.size.toLong)
    assert(recallOk && noFp)
  }

  test("simhash is deterministic; near-dup docs are hamming-close") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
    val s1 = sh.orderBy("doc_id").limit(3).as[(Long, Long)].collect()
    val s2 = sh.orderBy("doc_id").limit(3).as[(Long, Long)].collect()
    assert(s1.toSeq === s2.toSeq)
    val pairs = Dedup.simhashPairs(docs, maxDist = 3)
    assert(pairs.count() > 0)
  }

  test("simhashPairs equals brute-force hamming<=3 and emits each pair once") {
    // ground truth: unblocked all-pairs hamming over the full corpus
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
    val a = sh.select(col("doc_id").as("da"), col("s").as("sa"))
    val b = sh.select(col("doc_id").as("db"), col("s").as("sb"))
    val brute = a.crossJoin(b).filter(col("da") < col("db"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val banded = Dedup.simhashPairs(docs, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    // pigeonhole recall at d<=3 is exact, and the first-agreeing-band
    // rule must emit each pair EXACTLY once (no distinct in the plan)
    assert(banded.toSet === brute)
    assert(banded.length === banded.toSet.size, "duplicate pair emitted")
  }

  test("simhashPairs bounded on a degenerate corpus (10k identical docs)") {
    // 10k copies of one text -> every signature identical -> all four
    // band buckets are maximally hot. The salt spreads the within-bucket
    // cross product over tasks and the first-band rule emits each of the
    // n(n-1)/2 pairs exactly once (at band 0) with no distinct shuffle.
    val n = 10000
    val degenerate = spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        lit("boilerplate header repeated verbatim across the crawl").as("text"),
        lit("en").as("lang"))
    val got = Dedup.simhashPairs(degenerate, maxDist = 3).count()
    assert(got === n.toLong * (n - 1) / 2)
  }

  test("ngram jaccard agrees with a hand-computed pair") {
    val two = Seq((1L, "abcd", "en", 4L), (2L, "abce", "en", 4L))
      .toDF("doc_id", "text", "lang", "n_chars")
    // grams(1)={abc,bcd}, grams(2)={abc,bce}; jaccard = 1/3
    val j = Dedup.ngramJaccardPairs(two, threshold = 0.0)
      .select("jaccard").as[Double].collect()(0)
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("ngram prefix filtering returns exactly the all-pairs result") {
    // the prefix-filter theorem says the candidate pruning loses nothing;
    // verify against an unblocked within-lang all-pairs join at a low
    // threshold (more boundary pairs to get wrong)
    val t = 0.5
    val g = docs.select(col("doc_id"), col("lang"),
      graft.functions.NgramHashes.ngram_hashes(Dedup.normText(col("text")), 3)
        .as("grams"))
    val a = g.select(col("lang"), col("doc_id").as("doc_a"),
      col("grams").as("g_a"))
    val b = g.select(col("lang"), col("doc_id").as("doc_b"),
      col("grams").as("g_b"))
    val jac = graft.functions.SortedIntersect
      .jaccard_sorted(col("g_a"), col("g_b"))
    val brute = a.join(b, "lang").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jac.as("j"))
      .filter(col("j") >= t)
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, j) => (x, y) -> j }.toMap
    val pruned = Dedup.ngramJaccardPairs(docs, threshold = t)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, j) => (x, y) -> j }.toMap
    assert(brute.nonEmpty, "corpus should contain pairs at t=0.5")
    assert(pruned.keySet === brute.keySet,
      s"missed=${(brute.keySet -- pruned.keySet).take(5)} " +
        s"extra=${(pruned.keySet -- brute.keySet).take(5)}")
    assert(brute.forall { case (k, j) => pruned(k) === j })
  }

  test("ngram bands: pair at EXACTLY the threshold ratio is probed") {
    // grams(A)={abc,bcd,cde,def} ⊂ grams(B) (5 grams) → J = 4/5 = t
    // exactly, with the count ratio 4/5 sitting on the log-band boundary
    // the old fp floor(log/logBase) could in principle split two bands
    // apart; the integer-boundary band assignment must keep them within
    // the ±1 probe
    val two = Seq((1L, "abcdef", "en"), (2L, "abcdefg", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Dedup.ngramJaccardPairs(two, threshold = 0.8)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 0.8)))
  }

  test("embedding near-dup pairs: within-label, threshold respected") {
    val emb = Tables.embeddings(spark, sf)
    val pairs = Dedup.embeddingNearDupPairs(emb, threshold = 0.4)
    val cos = pairs.select("cosine").as[Double].collect()
    assert(cos.forall(_ >= 0.4))
  }
  test("editDistancePairs: finds typo pairs inside blocks, respects maxDist") {
    import spark.implicits._
    // strings shorter than cmpLen=40 so the FULL text is compared
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps"),
      (2L, "en", "the quick brown fox jumpz"),   // 1 edit from doc 1
      (3L, "en", "the quick brawn fox jumps"),   // 1 edit from doc 1
      (4L, "en", "completely different text"),
      (5L, "de", "the quick brown fox jumps")    // other lang block
    ).toDF("doc_id", "lang", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 5)
      .select("doc_a", "doc_b", "edit_dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.find(p => p._1 == 1L && p._2 == 2L).get._3 === 1)
    // cross-lang and different-prefix rows never pair
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L || p._2 == 5L))
  }

  test("spanDedup: duplicated spans drop, first occurrence survives") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"license$i").mkString(" ") // one exact span
    val docs = Seq(
      (1L, boiler + " " + (1 to 10).map(i => s"alpha$i").mkString(" ")),
      (2L, boiler + " " + (1 to 10).map(i => s"beta$i").mkString(" ")),
      (3L, (1 to 7).map(i => s"gamma$i").mkString(" ")) // one partial span
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, k = 10)
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ===
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 1L, 1L)))
    // doc 2 keeps only its own content; its fingerprint is md5 over the
    // kept span-hash sequence — here, md5(md5(beta span))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val betaFp = md5hex(md5hex((1 to 10).map(i => s"beta$i").mkString(" ")))
    assert(got(1)._4 === Some(betaFp))
  }

  test("spanDedup: a doc that is entirely boilerplate keeps nothing (null md5)") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, k = 10)
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 1L, got.head._4),
      (2L, 1L, 0L, None)))
    assert(got.head._4.isDefined)
  }

  test("boilerplateRemoval: shared chunks drop everywhere, docs re-assemble") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"license$i").mkString(" ")
    val alpha = (1 to 10).map(i => s"alpha$i").mkString(" ")
    val beta = (1 to 10).map(i => s"beta$i").mkString(" ")
    val gamma = (1 to 7).map(i => s"gamma$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + alpha),
      (2L, boiler + " " + beta),
      (3L, gamma)
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateRemoval(docs, k = 10, maxDocs = 2)
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 1L, Some(alpha)),
      (2L, 2L, 1L, Some(beta)),
      (3L, 1L, 1L, Some(gamma))))
  }

  test("boilerplateRemoval: all-boilerplate doc empties to null text") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val got = Dedup.boilerplateRemoval(docs, k = 10, maxDocs = 2)
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    assert(got === Seq((1L, 1L, 0L, None), (2L, 1L, 0L, None)))
  }

  test("semanticDedup: transitive chain collapses to one component, min kept") {
    import spark.implicits._
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    // chain 1~2~3 at cos25° ≈ 0.906 per hop; 1~3 at cos50° ≈ 0.64 is
    // BELOW the 0.9 threshold — only reachability puts 3 in component 1
    val emb = Seq(
      (1L, v(0), 0), (2L, v(25), 0), (3L, v(50), 0),
      (4L, v(140), 0),      // isolated within label 0
      (5L, v(0), 1)         // alone in label 1
    ).toDF("vec_id", "embedding", "label")
    val got = Dedup.semanticDedup(emb, threshold = 0.9)
      .as[(Long, Int, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      (1L, 0, 1L, true), (2L, 0, 1L, false), (3L, 0, 1L, false),
      (4L, 0, 4L, true), (5L, 1, 5L, true)))
  }

  test("semanticDedupAuto: learned cells, kept mask, no near-dup survivors") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val got = Dedup.semanticDedupAuto(emb, nlist = 4, threshold = 0.35)
    val rows = got.as[(Long, Int, Long, Boolean)].collect()
    assert(rows.length.toLong === n, "every vector labeled")
    // kept flag is exactly (vec_id == component)
    assert(rows.forall { case (v, _, c, k) => k === (v == c) })
    // deterministic: fixed seed => identical output on a second build
    val again = Dedup.semanticDedupAuto(emb, nlist = 4, threshold = 0.35)
      .as[(Long, Int, Long, Boolean)].collect()
    assert(rows.toSeq === again.toSeq)
    // the SemDeDup contract: no two SURVIVORS in the same cell are
    // cosine near-dups at the threshold
    val kept = got.filter(col("kept"))
      .select(col("vec_id"), col("cell").as("label"))
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val survivors = Dedup.embeddingNearDupPairs(kept, threshold = 0.35)
    assert(survivors.count() === 0L)
  }

  test("semanticDedupExact refuses thresholds outside the Long-safe range") {
    val emb = Tables.embeddings(spark, sf)
    // den > 181 ⇒ den²·2^48 exceeds Long; the predicate would wrap
    intercept[IllegalArgumentException] {
      Dedup.semanticDedupExact(emb, thresholdNum = 70, thresholdDen = 200)
    }
    intercept[IllegalArgumentException] { // num > den is not a cosine bound
      Dedup.semanticDedupExact(emb, thresholdNum = 120, thresholdDen = 100)
    }
    intercept[IllegalArgumentException] {
      Dedup.semanticDedupExact(emb, thresholdNum = -1, thresholdDen = 100)
    }
  }

  test("semanticDedupExact: contract + brute-force integer replay") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val got = Dedup.semanticDedupExact(emb, k = 4, iters = 2)
    val rows = got.as[(Long, Int, Long, Boolean)].collect()
    assert(rows.length.toLong === n, "every vector labeled")
    assert(rows.forall { case (v, _, c, k) => k === (v == c) })
    // component id is the minimum member of its component
    val byComp = rows.groupBy(_._3)
    assert(byComp.forall { case (c, ms) => ms.map(_._1).min === c })
    // deterministic run-over-run
    val again = Dedup.semanticDedupExact(emb, k = 4, iters = 2)
      .as[(Long, Int, Long, Boolean)].collect()
    assert(rows.toSeq === again.toSeq)

    // brute-force scala replay of the integer predicate within cells:
    // same pairs => same components => same survivors
    val cells = rows.map(r => r._1 -> r._2).toMap
    val qc = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 512.0).cast("long")).as("qc"))
      .as[(Long, Seq[Long])].collect().toMap
    def nrm(v: Seq[Long]): Long = v.map(x => x * x).sum
    val ids = rows.map(_._1).sorted
    val expectedPairs = for {
      a <- ids; b <- ids
      if a < b && cells(a) == cells(b)
      dot = qc(a).zip(qc(b)).map { case (x, y) => x * y }.sum
      if dot > 0 && nrm(qc(a)) > 0 && nrm(qc(b)) > 0 &&
        dot * dot * 10000L >= nrm(qc(a)) * nrm(qc(b)) * 1225L
    } yield (a, b)
    // union-find over expected pairs
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    expectedPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expComp = ids.map(i => i -> find(i)).toMap
    assert(rows.forall { case (v, _, c, _) => expComp(v) === c })
  }

  test("crossCorpusNewBloom ≡ crossCorpusNew (no-false-negative theorem)") {
    val batch = docs.filter(length(col("source")) > 4)
    val reference = docs.filter(length(col("source")) <= 4)
    val exact = Dedup.crossCorpusNew(batch, reference)
      .select("doc_id", "source", "content_key")
      .as[(Long, String, String)].collect().toSet
    // tiny filter + high fpp: force real false positives through the
    // suspect path so the exact-confirm stage is exercised, not idle
    val bloom = Dedup.crossCorpusNewBloom(batch, reference,
      expectedItems = 50L, fpp = 0.5)
      .select("doc_id", "source", "content_key")
      .as[(Long, String, String)].collect().toSet
    assert(exact.nonEmpty)
    assert(bloom === exact)
  }

  test("containmentPairs: directional — the quote is found, the host is not") {
    val corpus = Seq(
      // doc 1 is a verbatim excerpt of doc 2's middle; doc 2 is much
      // larger, so Jaccard is low but C(1→2) = 1.0
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "intro words here alpha beta gamma delta epsilon and then " +
        "a very long tail of unrelated content goes on and on forever"),
      (3L, "totally different document about other things")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, pct = 60)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) === Seq((1L, 2L)),
      "only the excerpt direction crosses 60%")
    assert(got.head._3 === 1.0, "verbatim excerpt: every shingle shared")
    // the host direction exists but is far below threshold
    val all = Dedup.containmentPairs(corpus, pct = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(all.contains((2L, 1L)) && all.contains((1L, 2L)))
  }

  test("containmentPairs: threshold boundary is integer-exact") {
    // A has 5 shingles (7 words), 3 shared with B => 60% exactly — the
    // >= boundary must admit it; at pct=61 it must not
    val corpus = Seq(
      (1L, "a b c d e f g"),               // shingles: abc bcd cde def efg
      (2L, "a b c d e x y z")              // shares abc bcd cde (3 of 5)
    ).toDF("doc_id", "text")
    val at60 = Dedup.containmentPairs(corpus, pct = 60)
      .select("doc_a", "doc_b", "shared", "n_a")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(at60.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 3L && r._4 == 5L))
    val at61 = Dedup.containmentPairs(corpus, pct = 61)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(!at61.contains((1L, 2L)))
  }

  test("containmentPairs: df-capped run is a subset of the exact run") {
    val exact = Dedup.containmentPairs(docs, pct = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.containmentPairs(docs, pct = 50, maxDf = 5L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus must contain partial copies")
    assert(capped.subsetOf(exact))
  }

  test("thresholdSweep: monotone counts, rows per threshold match per-threshold pair runs") {
    val docs = Tables.documents(spark, sf)
    val sweep = Dedup.thresholdSweep(docs, Seq(0.7, 0.8, 0.9))
      .as[(Int, Long, Long)].collect().toSeq
    assert(sweep.map(_._1) === Seq(70, 80, 90))
    // tightening the threshold can only shed pairs and docs
    assert(sweep.map(_._2) === sweep.map(_._2).sorted.reverse)
    assert(sweep.map(_._3) === sweep.map(_._3).sorted.reverse)
    // each row equals an independent pair run at that threshold
    sweep.foreach { case (pct, nPairs, nDocs) =>
      val p = Dedup.ngramJaccardPairs(docs, pct / 100.0)
      assert(p.count() === nPairs, s"pair count at $pct")
      val d = p.select(col("doc_a")).union(p.select(col("doc_b")))
        .distinct().count()
      assert(d === nDocs, s"doc count at $pct")
    }
  }
}
