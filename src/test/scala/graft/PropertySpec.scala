package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NgramHashes, RollingHash, SortedIntersect}
import graft.sinks.Sink

/** Property tests (raw scalacheck generators, deterministic seeds). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: rolling hash composes — h(a++b) = (h(a)*B^|b| + h(b)) mod M") {
    val strs = Gen.alphaNumStr.map(_.take(40))
    samples(Gen.zip(strs, strs), 200).foreach { case (a, b) =>
      val ha = RollingHash.hashBytes(a.getBytes("UTF-8"))
      val hb = RollingHash.hashBytes(b.getBytes("UTF-8"))
      val bl = b.getBytes("UTF-8").length
      val pow = (0 until bl).foldLeft(1L)((p, _) => p * RollingHash.Base % RollingHash.Mod)
      val expected = (ha * pow % RollingHash.Mod + hb) % RollingHash.Mod
      assert(RollingHash.hashBytes((a + b).getBytes("UTF-8")) === expected,
        s"a=$a b=$b")
    }
  }

  test("property: SortedIntersect.count equals set intersection") {
    val arrays = Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted.toArray)
    samples(Gen.zip(arrays, arrays), 300).foreach { case (a, b) =>
      val got = SortedIntersect.count(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(a),
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(b))
      assert(got === a.toSet.intersect(b.toSet).size)
    }
  }

  test("property: qualifying gram-count ratios stay within ±1 band") {
    import graft.operators.Dedup
    // the coverage claim behind the ±1-band probe: for ANY threshold and
    // ANY integer count pair with min/max >= t (the necessary condition
    // for J >= t), the two counts' bands differ by at most 1
    // up to 0.9999: near-1 thresholds exercise the capped-r regime where
    // the band base floors at 2^(31/256) instead of nextUp(1/t)
    val ts = Gen.choose(0.05, 0.9999)
    val nbs = Gen.oneOf(
      Gen.choose(1L, 500L),                  // small, boundary-dense
      Gen.choose(1L, 2000000L))              // large
    samples(Gen.zip(ts, nbs), 400).foreach { case (t, nb) =>
      val bounds = Dedup.bandBoundaries(t)
      assert(bounds == bounds.sorted, s"boundaries monotone at t=$t")
      assert(bounds.size <= 256,
        s"boundary count must stay bounded for t=$t (got ${bounds.size})")
      // the extreme qualifying partner: the SMALLEST na with na/nb >= t
      val na = math.max(1L, math.ceil(t * nb - 1e-9).toLong)
      if (na.toDouble / nb >= t) {
        val gap = Dedup.bandOfCount(nb, bounds) - Dedup.bandOfCount(na, bounds)
        assert(gap >= 0 && gap <= 1,
          s"t=$t na=$na nb=$nb bands=(${Dedup.bandOfCount(na, bounds)}," +
            s"${Dedup.bandOfCount(nb, bounds)})")
      }
      // bands are non-decreasing in n around the sampled point
      assert(Dedup.bandOfCount(nb, bounds) <=
        Dedup.bandOfCount(nb + 1, bounds))
    }
  }

  test("property: early-exit jaccardGe decides exactly like jaccard >= t") {
    val arrays = Gen.listOf(Gen.choose(-30L, 30L)).map(_.distinct.sorted.toArray)
    val thresholds = Gen.oneOf(0.0, 0.2, 1.0 / 3.0, 0.5, 0.65, 0.8, 1.0)
    samples(Gen.zip(arrays, arrays, thresholds), 500).foreach { case (a, b, t) =>
      def ad(x: Array[Long]) = org.apache.spark.sql.catalyst.expressions
        .UnsafeArrayData.fromPrimitiveArray(x)
      val exact = SortedIntersect.jaccard(ad(a), ad(b)) >= t
      val fast = SortedIntersect.jaccardGe(ad(a), ad(b), t)
      assert(fast === exact, s"a=${a.toSeq} b=${b.toSeq} t=$t")
    }
  }

  test("property: ngram hash sets match a straightforward implementation") {
    val strs = Gen.alphaNumStr.map(_.take(30))
    samples(strs, 200).foreach { s =>
      val got = {
        val ad = NgramHashes.hashed(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), 3)
        (0 until ad.numElements()).map(ad.getLong).toSet
      }
      val bytes = s.getBytes("UTF-8")
      val expectedCount =
        if (bytes.length <= 3) 1
        else bytes.sliding(3).map(_.toSeq).toSet.size
      assert(got.size === expectedCount, s"s=$s")
    }
  }

  test("property: insertSql column order is sorted and placeholders sequential") {
    val ident = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(10))
    val entry = Gen.zip(ident, Gen.choose(0, 100))
    samples(Gen.nonEmptyListOf(entry), 150).foreach { kvs =>
      val data: Map[String, Any] = kvs.toMap
      Sink.insertSql("t", data) match {
        case Right((sql, values)) =>
          val cols = sql.substring(sql.indexOf('(') + 1, sql.indexOf(')'))
            .split(", ").toSeq
          assert(cols === cols.sorted)
          assert(values.length === cols.length)
          assert(sql.contains((1 to cols.length).map(i => s"$$$i").mkString("(", ", ", ")")))
        case Left(e) => fail(s"unexpected reject: $e")
      }
    }
  }

  test("property: topicMatches — '#' dominates, exact always matches") {
    val seg = Gen.oneOf("a", "bb", "c1")
    val topic = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, seg)).map(_.mkString("/"))
    samples(topic, 200).foreach { t =>
      assert(graft.functions.MqttFunctions.topicMatches("#", t))
      assert(graft.functions.MqttFunctions.topicMatches(t, t))
    }
  }

  test("property: MG sketch guarantees under random streams, chunkings, merge trees") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.FreqSketchAgg

    val capacity = 8
    val agg = FreqSketchAgg(BoundReference(0, StringType, nullable = true), capacity)
    // zipf-ish stream: few heavy items over a long tail
    val item = Gen.frequency(
      8 -> Gen.oneOf("hot1", "hot2", "hot3"),
      3 -> Gen.oneOf("warm1", "warm2", "warm3", "warm4"),
      2 -> Gen.choose(0, 400).map(i => s"tail$i"))
    val stream = Gen.choose(50, 800).flatMap(n => Gen.listOfN(n, item))
    samples(Gen.zip(stream, Gen.choose(1, 7)), 40).foreach { case (items, chunks) =>
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = items.size.toLong
      // build one partial buffer per chunk, then fold-merge (a skewed
      // merge tree — the worst case for bound accumulation)
      val parts = items.grouped(math.max(1, items.size / chunks)).map { chunk =>
        val buf = agg.createAggregationBuffer()
        chunk.foreach(s => agg.update(buf, InternalRow(UTF8String.fromString(s))))
        // serialize/deserialize round-trip must be the identity
        agg.deserialize(agg.serialize(buf))
      }.toSeq
      val merged = parts.reduce(agg.merge)
      assert(merged.items.size <= capacity)
      assert(merged.n === n)
      assert(merged.decs <= n / (capacity + 1),
        s"decrement total ${merged.decs} exceeds n/(c+1) = ${n / (capacity + 1)}")
      merged.items.foreach { case (k, est) =>
        val truth = exact(k)
        assert(est <= truth && truth <= est + merged.decs,
          s"$k: est=$est true=$truth decs=${merged.decs}")
      }
      exact.filter(_._2 > n / (capacity + 1)).keys.foreach { k =>
        assert(merged.items.contains(k), s"heavy item $k missing")
      }
    }
  }

  test("property: spanDedup span arithmetic — counts partition into ceil(words/k)") {
    // pure check of the span-count contract the operator relies on:
    // n_spans(doc) = ceil(words/k), with the final span carrying the
    // remainder — mirrored against a straightforward grouped implementation
    val words = Gen.choose(0, 47).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd")))
    val k = 10
    samples(words, 200).foreach { ws =>
      val expected = if (ws.isEmpty) 0 else (ws.size + k - 1) / k
      val spans = ws.grouped(k).map(_.mkString(" ")).toSeq
      assert(spans.size === expected)
      assert(spans.mkString(" ") === ws.mkString(" "),
        "concatenating spans must reconstruct the document")
    }
  }

  test("property: tumbling chunk hashes equal xxhash64 of the chunk strings") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    // the codegen'd detection hasher must agree with hashing the
    // concat_ws(" ", slice) chunk strings one by one — hash equality IS
    // chunk-string equality, the invariant boilerplateRemoval rides on
    val words = Gen.choose(0, 47).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "d1")))
    val k = 10
    samples(words, 200).foreach { ws =>
      val got = graft.functions.MinHash.tumblingChunkHashes(
        UTF8String.fromString(ws.mkString(" ")), k)
      val chunks =
        if (ws.isEmpty) Seq.empty[String]
        else ws.grouped(k).map(_.mkString(" ")).toSeq
      assert(got.numElements() === chunks.size)
      chunks.zipWithIndex.foreach { case (c, i) =>
        val u = UTF8String.fromString(c)
        val exp = XXH64.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        assert(got.getLong(i) === exp)
      }
    }
  }

  test("property: bucket kernel hit flags are invariant under micro-batch chunking") {
    // the cross-batch consistency contract every streaming near-dup
    // consumer rides on: splitting an ordered probe sequence into
    // arbitrary micro-batch chunks (state carried between calls) yields
    // EXACTLY the same hit flags as one call over the whole sequence
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.{BucketSigs, StreamingNearDup}

    def run(rows: Seq[(Long, Long)], chunks: Seq[Int]): Seq[Boolean] = {
      // rows = (tsMs, sig) in event order; chunks = sizes partitioning it
      var carried: Option[BucketSigs] = None
      val out = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      var rest = rows
      for (n <- chunks) {
        val (batch, r) = rest.splitAt(n)
        rest = r
        if (batch.nonEmpty) {
          val state = TestGroupState.create[BucketSigs](
            carried.map(Optional.of[BucketSigs])
              .getOrElse(Optional.empty[BucketSigs]()),
            GroupStateTimeout.EventTimeTimeout,
            0L, Optional.of[Long](0L), false)
          out ++= StreamingNearDup.probeBucket(
            batch, state, 60000L, 3, 8)(_._1, _._2).map(_._2)
          carried = if (state.exists) Some(state.get) else None
        }
      }
      out.toSeq
    }

    // signatures drawn from a small pool so near-collisions (hamming
    // <= 3) and the bucket cap (8) are both exercised
    val sigPool = Seq(0L, 1L, 3L, 7L, 15L, 255L, -1L, Long.MaxValue,
      0x5555555555555555L, 0x5555555555555554L)
    val seqs = Gen.choose(1, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(sigPool)))
    samples(Gen.zip(seqs, Gen.choose(1, 5)), 200).foreach {
      case (sigs, chunkSize) =>
        val rows = sigs.zipWithIndex.map { case (s, i) => (i * 1000L, s) }
        val whole = run(rows, Seq(rows.size))
        val chunked = run(rows,
          Seq.fill(rows.size / chunkSize + 1)(chunkSize))
        assert(chunked === whole,
          s"chunking by $chunkSize changed verdicts for $sigs")
    }
  }
}
