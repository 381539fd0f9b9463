package graft

import org.apache.spark.sql.functions._

import graft.operators.Assembly

class AssemblySpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf)

  test("hashSplit: total coverage, rough proportions, no nulls") {
    val split = Assembly.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = docs.count()
    assert(counts.values.sum === n, "every row gets exactly one split")
    assert(!counts.contains(null), "no row escapes assignment")
    assert(counts("train") > n * 6 / 10, s"train too small: $counts")
    assert(counts("val") > 0 && counts("test") > 0, s"empty split: $counts")
  }

  test("hashSplit: assignment is stable under repartitioning") {
    def assign(df: org.apache.spark.sql.DataFrame) =
      Assembly.hashSplit(df, "doc_id",
          Seq("a" -> 0.5, "b" -> 0.5), salt = "s1")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(assign(docs) === assign(docs.repartition(7)),
      "a row's split must depend only on its id")
  }

  test("hashSplit: different salts give different assignments") {
    def assign(salt: String) =
      Assembly.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5), salt)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(assign("s1") !== assign("s2"))
  }

  test("splitBoundaries: monotone, last bound covers everything") {
    val b = Assembly.splitBoundaries(Seq(0.8, 0.1, 0.1))
    assert(b.size === 3)
    assert(b.init === b.init.sorted)
    assert(b.last > "ffff", "remainder split must catch every bucket")
  }

  test("stratifiedSample: exactly floor(n/den*num) rows per stratum") {
    val sample = Assembly.stratifiedSample(docs, "lang", "doc_id", 1, 5)
    val got = sample.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) === n / 5, s"stratum $lang")
    }
    // sampled rows are a subset of the input
    assert(sample.join(docs, Seq("doc_id"), "left_anti").count() === 0)
  }

  test("stratifiedSample: deterministic across invocations") {
    def ids = Assembly.stratifiedSample(docs, "lang", "doc_id", 1, 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === ids)
  }

  test("weightedMix: rate-1 source kept whole, rates bound the rest") {
    val mixed = Assembly.weightedMix(docs, "source", "doc_id",
      rates = Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.25)
    val got = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(got("src0") === full("src0"), "rate 1.0 must keep every row")
    assert(got.getOrElse("src1", 0L) <= full("src1"))
    // with 25-row sources, expected default-rate counts are ~6; allow wide
    // stochastic slack but require real downsampling in aggregate
    val defaultKept = got.filterNot(k => Set("src0", "src1")(k._1)).values.sum
    val defaultFull = full.filterNot(k => Set("src0", "src1")(k._1)).values.sum
    assert(defaultKept < defaultFull / 2,
      s"default rate 0.25 kept $defaultKept of $defaultFull")
  }

  test("weightedMixEpochs: floor(rate) guaranteed copies + hash frac") {
    val mixed = Assembly.weightedMixEpochs(docs, "source", "doc_id",
      rates = Map("src0" -> 2.5, "src1" -> 1.0), defaultRate = 0.25)
    val copies = mixed.groupBy("source", "doc_id").count()
      .as[(String, Long, Long)].collect()
    val bySrc = copies.groupBy(_._1)
    assert(bySrc("src0").forall(c => c._3 == 2 || c._3 == 3),
      "rate 2.5: every row 2 or 3 copies")
    assert(bySrc("src0").exists(_._3 == 3), "rate 2.5: some rows get 3")
    assert(bySrc("src1").forall(_._3 == 1), "rate 1.0: exactly one copy")
    assert(bySrc.filterNot(k => Set("src0", "src1")(k._1))
      .values.flatten.forall(_._3 == 1),
      "default 0.25: surviving rows appear once")
    // copy tags are dense 0..n-1 per row
    val tags = mixed.filter($"source" === "src0")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sort_array(
        org.apache.spark.sql.functions.collect_list($"copy")).as("tags"))
      .as[(Long, Seq[Int])].collect()
    assert(tags.forall(t => t._2 == (0 until t._2.size)))
  }

  test("curate: composed pipeline keeps quality-deduped docs, all split") {
    import graft.operators.{Curation, Dedup, TextAnalysis}
    val out = Curation.curate(docs)
    val rows = out.select("doc_id", "quality_score", "split")
      .as[(Long, Double, String)].collect()
    assert(rows.nonEmpty && rows.length < docs.count(),
      "threshold+dedup must drop something")
    assert(rows.forall(_._2 >= 0.5))
    assert(rows.forall(r => Set("train", "val", "test")(r._3)))
    // survivors have unique normalized content
    val keys = docs
      .join(out.select("doc_id"), "doc_id")
      .select(org.apache.spark.sql.functions.md5(
        Dedup.normText($"text")).as("k"))
      .as[String].collect()
    assert(keys.distinct.length === keys.length, "no duplicate content")
  }

  test("globalShuffle: dense permutation, deterministic, hash-ordered") {
    val out = Assembly.globalShuffle(docs, "doc_id")
    val rows = out.select("pos", "doc_id").as[(Long, Long)].collect()
      .sortBy(_._1)
    val n = docs.count()
    assert(rows.map(_._1).toSeq === (0L until n).toSeq, "dense 0..n-1")
    assert(rows.map(_._2).distinct.length === n.toInt, "a permutation")
    // matches an independent driver-side ordering by the same hash
    val expect = docs.select(
        md5(concat(lit("graft"), $"doc_id".cast("string")).cast("binary")),
        $"doc_id")
      .as[(String, Long)].collect().sortBy(identity).map(_._2).toSeq
    assert(rows.map(_._2).toSeq === expect)
    // shuffled: the hash order must not be the identity order
    assert(rows.map(_._2).toSeq !== rows.map(_._2).sorted.toSeq)
  }

  test("writeShardsWithManifest: full shards, readable layout, manifest matches") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = Assembly.writeShardsWithManifest(
      docs, "doc_id", docsPerShard = 100, sizeCol = "n_chars", path = dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val n = docs.count()
    assert(manifest.map(_._2).sum === n, "manifest covers every doc")
    // every shard but the last is exactly full
    assert(manifest.init.forall(_._2 === 100L))
    assert(manifest.last._2 <= 100L)
    // shard ids are dense from 0
    assert(manifest.map(_._1) === manifest.indices.map(_.toLong))
    // the written layout reads back with the same per-shard counts
    val back = spark.read.parquet(dir)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(back === manifest.map(m => m._1 -> m._2).toMap)
  }

  test("temperatureMix: T=1 reproduces natural proportions exactly") {
    // power-of-two counts make every rate computation float-exact, so
    // T=1 must equal a flat weightedMix at the target fraction
    val df = ((0 until 64).map(i => (i.toLong, "a")) ++
      (64 until 128).map(i => (i.toLong, "b")))
      .toDF("doc_id", "source")
    val t1 = Assembly.temperatureMix(df, "source", "doc_id",
      temperature = 1.0, targetFraction = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val flat = Assembly.weightedMix(df, "source", "doc_id",
      rates = Map.empty, defaultRate = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(t1 === flat)
    assert(t1.nonEmpty && t1.size < 128)
  }

  test("temperatureMix: T=2 upsamples the small source to full (clamped)") {
    // counts 900/100, T=2, frac=0.5: w = (30, 10), budget = 500 ->
    // rate_b = 500*(10/40)/100 = 1.25 -> clamped to 1.0 (keep ALL of b);
    // rate_a = 500*(30/40)/900 = 0.41666...
    val df = ((0 until 900).map(i => (i.toLong, "a")) ++
      (900 until 1000).map(i => (i.toLong, "b")))
      .toDF("doc_id", "source")
    val kept = Assembly.temperatureMix(df, "source", "doc_id",
      temperature = 2.0, targetFraction = 0.5)
      .select("source", "doc_id").as[(String, Long)].collect()
    val bySource = kept.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySource("b") === 100, "small source upsampled to keep-all")
    val aFrac = bySource("a").toDouble / 900
    assert(aFrac > 0.35 && aFrac < 0.48,
      s"large source downsampled to ~0.4167, got $aFrac")
  }

  test("chunkWindows: coverage, overlap, tail, and short-doc semantics") {
    val df = Seq(
      (1L, (1 to 95).map(i => s"w$i").mkString(" ")), // 95 words
      (2L, "a b c"),                                  // shorter than one window
      (3L, "")                                        // empty -> no chunks
    ).toDF("doc_id", "text")
    val out = Assembly.chunkWindows(df, window = 50, stride = 40)
      .select("doc_id", "chunk_idx", "chunk_start", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toList
    // doc 1: starts 0, 40, 80 -> lengths 50, 50, 15
    assert(out.filter(_._1 == 1L) ===
      List((1L, 0L, 0L, 50L), (1L, 1L, 40L, 50L), (1L, 2L, 80L, 15L)))
    // doc 2: one short chunk covering the whole doc
    assert(out.filter(_._1 == 2L) === List((2L, 0L, 0L, 3L)))
    assert(!out.exists(_._1 == 3L), "empty doc yields no chunks")
  }

  test("chunkWindows: consecutive chunks share window-stride words") {
    val df = Seq((1L, (1 to 90).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    // materialize chunk bodies the way the scaladoc describes
    val bodies = df
      .select(col("doc_id"),
        graft.operators.TextAnalysis.wordArray(col("text")).as("ws"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("ws"), 1, 50)).as("c0"),
        concat_ws(" ", slice(col("ws"), 41, 50)).as("c1"),
        concat_ws(" ", slice(col("ws"), 81, 50)).as("c2"))
      .as[(Long, String, String, String)].head()
    val tail0 = bodies._2.split(" ").drop(40).toList
    val head1 = bodies._3.split(" ").take(10).toList
    assert(tail0 === head1, "10-word overlap between consecutive chunks")
    // and the registered query's md5 matches md5 of those bodies
    val md5s = Assembly.chunkWindows(df, 50, 40)
      .select("chunk_md5").as[String].collect().toList
    val expected = List(bodies._2, bodies._3, bodies._4).map { s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(md5s === expected)
  }
}
