package graft

import graft.operators.Tokenizer
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("bpeMerges learns the hand-computed trajectory") {
    // vocab: ab (freq 3), abc (freq 1)
    val docs = docsOf("ab ab ab", "abc")
    val m = Tokenizer.bpeMerges(docs, steps = 5)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // step 1: (a,b) count 4; step 2: (ab,c) count 1; then exhausted
    assert(m === Seq(
      (1, "a", "b", "ab", 4L),
      (2, "ab", "c", "abc", 1L)))
  }

  test("bpeMerges merge application is left-to-right non-overlapping") {
    // "aaaa" -> " a a a a ": (a,a) has 3 occurrences counted, but literal
    // replace fuses only positions 1-2 (the 2-3 pair shares a space with
    // the first match): " aa a a ". Next round ties (a,a)=1 vs (aa,a)=1
    // break by lhs: (a,a) wins -> " aa aa ". Then (aa,aa) -> " aaaa ".
    val docs = docsOf("aaaa")
    val m = Tokenizer.bpeMerges(docs, steps = 4)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m === Seq(
      (1, "a", "a", "aa", 3L),
      (2, "a", "a", "aa", 1L),
      (3, "aa", "aa", "aaaa", 1L)))
  }

  test("bpeMerges ties break by (lhs, rhs) after count") {
    // "xy" and "zw" each freq 1: (x,y) and (z,w) tie at 1 -> (x,y) first
    val docs = docsOf("xy zw")
    val m = Tokenizer.bpeMerges(docs, steps = 2)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m.head === ((1, "x", "y", "xy", 1L)))
    assert(m(1) === ((2, "z", "w", "zw", 1L)))
  }

  test("bpeMerges is weighted by corpus frequency, not vocab presence") {
    // (c,d) appears in one word but that word occurs 5 times -> beats
    // (a,b) which appears in two distinct words (freq 1 each)
    val docs = docsOf("cd cd cd cd cd", "ab", "abe")
    val m = Tokenizer.bpeMerges(docs, steps = 1)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(m.head === ((1, "c", "d", "cd", 5L)))
  }

  test("bpeEncode applies merges in order and respects word boundaries") {
    val docs = docsOf("ab ab cab", "b a")
    // merges: (a,b)->ab, (c,ab)->cab
    val enc = Tokenizer.bpeEncode(docs, Seq("a" -> "b", "c" -> "ab"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 0: words ab, ab, cab -> subwords [ab, ab, cab]: 3 subwords, 3 fused
    // doc 1: words b, a -> no merge crosses the word boundary: 2 subwords
    assert(enc(0) === ((0L, 3L, 3L, 3L)))
    assert(enc(1) === ((1L, 2L, 2L, 0L)))
  }

  test("bpeEncode fingerprint equals the manual symbol join") {
    val docs = docsOf("abc abc")
    val enc = Tokenizer.bpeEncode(docs, Seq("a" -> "b"))
    val got = enc.select("encoding_md5").as[String].head()
    val expect = docs.sparkSession.sql(
      "SELECT md5('ab c ab c') AS m").as[String].head()
    assert(got === expect)
  }

  test("bpeEncode handles docs with no words") {
    val docs = docsOf("", "...", "ab")
    val enc = Tokenizer.bpeEncode(docs, Seq("a" -> "b"))
      .select("doc_id", "n_subwords").as[(Long, Long)].collect().toSeq
    assert(enc === Seq((0L, 0L), (1L, 0L), (2L, 1L)))
  }

  test("bpeMergesLocal is bit-identical to the Spark loop") {
    // adversarial overlap shapes: "aaaa"/"aaaaa" pin the shielded-symbol
    // fuse semantics; mixed corpus pins tie-breaks and weighting
    val adversarial = docsOf("aaaa", "aaaaa", "aaa a", "ab ab ab", "abc",
      "cd cd cd cd cd", "xy zw", "b a", "x0x0x0")
    for (steps <- Seq(1, 3, 8)) {
      val spark_ = Tokenizer.bpeMerges(adversarial, steps).collect().toSeq
      val local  = Tokenizer.bpeMergesLocal(adversarial, steps).collect().toSeq
      assert(local === spark_, s"steps=$steps")
    }
    // real corpus slice, the registered steps
    val docs = Tables.documents(spark, sf)
    val a = Tokenizer.bpeMerges(docs, steps = 8).collect().toSeq
    val b = Tokenizer.bpeMergesLocal(docs, steps = 8).collect().toSeq
    assert(a === b)
  }

  test("bpeMergesLocal sustains large steps (the 32k-merge shape)") {
    val docs = Tables.documents(spark, sf)
    val m = Tokenizer.bpeMergesLocal(docs, steps = 64)
      .select("step").as[Int].collect().toSeq
    assert(m === (1 to 64), "64 consecutive merge steps learned")
  }

  test("bpeMergesLocal minFreq floor: hapax vocab dropped, merges above the floor unchanged") {
    // common mass: 30 copies of "hello world" → pair counts 30; hapax
    // noise: 40 unique words over a DISJOINT alphabet ({z,q,x,k,j,v,b,n}
    // + digits — no char of hello/world), so the floor can only remove
    // pairs that never compete with the real merges
    val sym = "zqxkjvbn"
    val hapax = (0 until 40).map(i =>
      s"${sym(i % 8)}${sym((i / 8 + i) % 8)}${i}")
    val docs = (Seq.fill(30)("hello world") ++ hapax)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val floor0 = Tokenizer.bpeMergesLocal(docs, steps = 6).collect().toSeq
    val floor2 = Tokenizer.bpeMergesLocal(docs, steps = 6, minFreq = 2L)
      .collect().toSeq
    assert(floor2 === floor0,
      "merges above the floor (count 30 vs hapax pairs ≤ 6) must be invariant")
    // the ScaleCheck-style shrink receipt: the collected vocab is the
    // ≥-floor table — hapax words are gone before the driver sees them
    import graft.operators.TextAnalysis
    val vocabAll = docs
      .select(explode(TextAnalysis.wordArray(col("text"))).as("w"))
      .groupBy("w").count()
    assert(vocabAll.count() === 42L) // hello, world + 40 hapax
    assert(vocabAll.filter(col("count") >= 2).count() === 2L)
  }

  test("bpeMergesLocal minFreq=1 default is unchanged behavior") {
    val docs = docsOf("aaaa", "ab ab ab", "cd cd")
    val a = Tokenizer.bpeMergesLocal(docs, steps = 4).collect().toSeq
    val b = Tokenizer.bpeMergesLocal(docs, steps = 4, minFreq = 1L)
      .collect().toSeq
    assert(a === b)
  }

  test("trainer is deterministic under repartition") {
    val docs = docsOf("ab ab ab", "abc", "xyz xyz").repartition(7)
    val a = Tokenizer.bpeMerges(docs, steps = 4).collect().toSeq
    val b = Tokenizer.bpeMerges(docs.repartition(3), steps = 4).collect().toSeq
    assert(a === b)
  }
}
