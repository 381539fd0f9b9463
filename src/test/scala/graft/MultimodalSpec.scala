package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.asMedia(Tables.documents(spark, sf))

  test("asMedia: binary content with typed metadata columns") {
    assert(media.columns.toSeq ===
      Seq("doc_id", "media_type", "n_bytes", "content"))
    assert(media.schema("content").dataType.typeName === "binary")
    val n = media.select(col("n_bytes"), length(col("content")).cast("long"))
      .as[(Long, Long)].collect()
    assert(n.forall { case (a, b) => a === b })
  }

  test("columnar metadata = honest blob stats; decode pass surfaces " +
      "NULL dims + decoded=false where no codec applies") {
    // the columnar pass never fabricates dimensions — only what a scan
    // can actually measure
    assert(Multimodal.metadata(media).columns.toSeq ===
      Seq("doc_id", "media_type", "n_bytes", "checksum"))
    val cols = Multimodal.metadata(media)
      .orderBy("doc_id")
      .select("doc_id", "n_bytes", "checksum")
      .as[(Long, Long, String)].collect()
    val decoded = Multimodal.decodeFeatures(media)
      .orderBy("doc_id")
      .select("doc_id", "n_bytes", "checksum")
      .as[(Long, Long, String)].collect()
    assert(cols.toSeq === decoded.toSeq)
    // text bytes: no codec ran, dims are null, the flag says so
    val flags = Multimodal.decodeFeatures(media).toDF()
      .select(col("decoded"),
        col("width").isNull && col("height").isNull && col("n_frames").isNull)
      .as[(Boolean, Boolean)].collect()
    assert(flags.forall { case (dec, allNull) => !dec && allNull })
  }

  test("real image bytes decode to true dimensions via ImageIO") {
    import graft.operators.Multimodal.{MediaFeatures, MediaRow}
    // synthesize a genuine 17x11 PNG in-memory
    val img = new java.awt.image.BufferedImage(
      17, 11, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq((42L, "image/png", png.length.toLong))
      .toDF("doc_id", "media_type", "n_bytes")
      .withColumn("content", lit(png))
    val f: MediaFeatures = Multimodal.decodeFeatures(media).collect()(0)
    assert((f.width, f.height, f.n_frames) ===
      ((Some(17), Some(11), Some(1))))
    assert(f.media_type === "image" && f.decoded)
    // text bytes: honest nulls, not fabricated dims
    val t = Multimodal.decodeFeatures(
      Multimodal.asMedia(Tables.documents(spark, sf).limit(1))).collect()(0)
    assert(t.media_type === "text/plain")
    assert(!t.decoded && t.width.isEmpty && t.height.isEmpty &&
      t.n_frames.isEmpty)
  }

  test("resize: real PNG scaled to the aspect-fit box, re-decodable") {
    // 400x300 genuine PNG -> fit 224x224 -> 224x168 (integer div)
    val img = new java.awt.image.BufferedImage(
      400, 300, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq((7L, "image/png", png.length.toLong))
      .toDF("doc_id", "media_type", "n_bytes")
      .withColumn("content", lit(png))
    val r = Multimodal.resize(media).collect()(0)
    assert((r.orig_w, r.orig_h) === ((Some(400), Some(300))))
    assert((r.width, r.height) === ((Some(224), Some(168))))
    assert(r.resized)
    // the emitted bytes are a real image of exactly those dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.content))
    assert((back.getWidth, back.getHeight) === ((224, 168)))
    // small images pass through unscaled
    val tiny = new java.awt.image.BufferedImage(
      17, 11, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val b2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", b2)
    val m2 = Seq((8L, "image/png", b2.size.toLong))
      .toDF("doc_id", "media_type", "n_bytes")
      .withColumn("content", lit(b2.toByteArray))
    val r2 = Multimodal.resize(m2).collect()(0)
    assert((r2.width, r2.height) === ((Some(17), Some(11))))
    // undecodable bytes: BYTE-IDENTICAL passthrough, null dims, flagged
    val opaque = "not an image at all".getBytes("UTF-8")
    val m3 = Seq((9L, "video/raw", opaque.length.toLong))
      .toDF("doc_id", "media_type", "n_bytes")
      .withColumn("content", lit(opaque))
    val r3 = Multimodal.resize(m3).collect()(0)
    assert(!r3.resized && r3.width.isEmpty && r3.orig_w.isEmpty)
    assert(r3.content.toSeq === opaque.toSeq)
  }

  test("resizePlan: columnar plan equals the codec stage's fit on REAL " +
      "decoded images") {
    // a spread of genuine PNGs across the fit cases: inside the box,
    // width-binding, height-binding, extreme aspect
    val dims = Seq((1L, 17, 11), (2L, 400, 300), (3L, 300, 400),
      (4L, 900, 50), (5L, 50, 900), (6L, 224, 224))
    val rows = dims.map { case (id, w, h) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      val png = baos.toByteArray
      Multimodal.MediaRow(id, "image/png", png.length.toLong, png)
    }
    val media = rows.toDF()
    // plan from DECODED dims (the production composition: decode once,
    // plan columnar, resize in the codec stage)
    val plan = Multimodal.resizePlan(
        Multimodal.decodeFeatures(media).toDF()
          .select($"doc_id", $"width", $"height"))
      .select($"doc_id", $"target_w", $"target_h")
      .as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val staged = Multimodal.resize(media).collect()
      .map(r => r.doc_id -> ((r.width.get, r.height.get))).toMap
    assert(plan === staged, "plan dims must equal the mapPartitions fit")
  }

  test("headerProbe: dims from container headers alone — PNG/GIF/BMP/" +
      "JPEG/TIFF agree with the full decode; torn and opaque bytes " +
      "null out") {
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    val fixtures = Seq(
      ("png", 17, 11), ("gif", 300, 200), ("bmp", 64, 48),
      ("jpg", 123, 77), ("tiff", 41, 29))
    fixtures.foreach { case (fmt, w, h) =>
      val bytes = encode(fmt, w, h)
      val want = if (fmt == "jpg") "jpeg" else fmt
      assert(Multimodal.headerDims(bytes) === Some((want, w, h)),
        s"$fmt header parse")
      // header dims == full-decode dims (same bytes, 2 ints vs pixels)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((w, h)))
      // torn header: truncation below every format's header length
      // nulls out, never guesses (GIF's is shortest at 10 bytes)
      assert(Multimodal.headerDims(bytes.take(8)) === None)
    }
    assert(Multimodal.headerDims("not an image".getBytes("UTF-8")) === None)
    assert(Multimodal.headerDims(Array[Byte]()) === None)
    // JPEG fill bytes running to EOF: the segment walk must refuse, not
    // read past the array (SOI + 0xFF padding with no marker byte)
    assert(Multimodal.headerDims(Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff)
      .map(_.toByte)) === None)
    // and a JPEG whose headers end before any SOF segment
    assert(Multimodal.headerDims(Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04,
      0x4a, 0x46).map(_.toByte)) === None)
    // hand-built BIG-endian TIFF (ImageIO writes little-endian, so the
    // MM branch needs its own vector): IFD at 8, two SHORT entries,
    // 320 wide x 200 high
    val beTiff = Array[Int](
      'M', 'M', 0, 0x2a, 0, 0, 0, 8, // magic + IFD offset 8
      0, 2, // 2 entries
      0x01, 0x00, 0, 3, 0, 0, 0, 1, 0x01, 0x40, 0, 0, // 256 SHORT 320
      0x01, 0x01, 0, 3, 0, 0, 0, 1, 0x00, 0xc8, 0, 0, // 257 SHORT 200
      0, 0, 0, 0 // next-IFD terminator
    ).map(_.toByte)
    assert(Multimodal.headerDims(beTiff) === Some(("tiff", 320, 200)))
    // torn IFD: valid magic, offset points past the bytes — refuse
    assert(Multimodal.headerDims(beTiff.take(12)) === None)
    // entry table truncated mid-entry — refuse, never read past the end
    assert(Multimodal.headerDims(beTiff.take(20)) === None)
    // a dims tag carrying a non-integer type must bail, not misread
    val badType = beTiff.clone()
    badType(13) = 5 // tag 256 type RATIONAL
    assert(Multimodal.headerDims(badType) === None)
    // the Dataset pass carries the same contract
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", 0L, encode("png", 17, 11)),
      Multimodal.MediaRow(2L, "text/plain", 4L, "text".getBytes("UTF-8")))
      .toDF()
    val got = Multimodal.headerProbe(rows).collect()
      .map(r => r.doc_id -> r).toMap
    assert(got(1L).probed && got(1L).width === Some(17) &&
      got(1L).format === Some("png"))
    assert(!got(2L).probed && got(2L).width.isEmpty &&
      got(2L).format.isEmpty)
  }

  test("frameSample: one row per frame, offsets stride-aligned") {
    val fs = Multimodal.frameSample(media, strideBytes = 128)
    val expected = media
      .select((col("n_bytes") / 128 + 1).cast("int")).as[Int]
      .collect().map(_.toLong).sum
    assert(fs.count() === expected)
    val offs = fs.filter(col("doc_id") === 0L)
      .select("byte_offset").as[Long].collect()
    assert(offs.forall(_ % 128 === 0))
  }

  /** 64×64 PNG whose gray level at (x, y) is `f(x, y)` (0..255). */
  private def png(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val g = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def mediaDf(rows: (Long, Array[Byte])*) =
    rows.toDF("doc_id", "content")
      .select(col("doc_id"), lit("image/png").as("media_type"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        col("content"))

  test("perceptualHash: REAL pixels — brightness-shift invariant, gradient-reversal maximal") {
    // dHash encodes only left-right luma ORDER: a uniform brightness
    // shift preserves every comparison (hamming 0), reversing the
    // gradient flips every comparison (hamming 64)
    val base = png((x, _) => x * 3)
    val brighter = png((x, _) => x * 3 + 40)
    val reversed = png((x, _) => 189 - x * 3)
    val hashes = Multimodal.perceptualHash(
      mediaDf((1L, base), (2L, brighter), (3L, reversed)))
      .collect().map(h => h.doc_id -> h).toMap
    assert(hashes.values.forall(_.is_image), "PNGs must decode for real")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L).phash, hashes(2L).phash) === 0)
    assert(ham(hashes(1L).phash, hashes(3L).phash) === 64)
  }

  test("imageNearDupPairs: finds the re-encoded twin, not the reversal") {
    val base = png((x, _) => x * 3)
    val twin = png((x, _) => x * 3 + 40)
    val other = png((x, _) => 189 - x * 3)
    val pairs = Multimodal.imageNearDupPairs(
      mediaDf((1L, base), (2L, twin), (3L, other)), maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(pairs.head._3 === 0)
  }

  test("perceptualHash: every ImageIO-decodable format passes the sniff (incl. TIFF/BMP)") {
    // the sniff must never reroute a decodable image to the stub branch:
    // re-encode the same gradient in each writer format the JDK ships
    // and require the REAL-pixel path (identical dHash, since dHash
    // depends only on pixel luma order, not the container)
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png((x, _) => x * 3)))
    val formats = Seq("png", "bmp", "gif", "jpg", "tif")
      .filter(f => javax.imageio.ImageIO.getImageWritersByFormatName(f).hasNext)
    assert(formats.contains("tif"), "JDK 9+ ships a TIFF writer")
    val blobs = formats.zipWithIndex.map { case (f, i) =>
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, f, buf), s"write $f failed")
      (i.toLong + 1, buf.toByteArray)
    }
    val hashes = Multimodal.perceptualHash(mediaDf(blobs: _*)).collect()
    assert(hashes.forall(_.is_image),
      s"sniff rerouted a decodable format to the stub: " +
        s"${formats.zip(hashes.map(_.is_image)).toSeq}")
    // lossless containers agree exactly with the PNG hash (JPEG may
    // wobble a few gradient bits at block edges)
    val byFmt = formats.zip(hashes.map(_.phash)).toMap
    Seq("bmp", "tif").foreach { f =>
      assert(byFmt(f) === byFmt("png"), s"$f dHash must equal png's")
    }
  }

  test("perceptualHash: stub branch equals the 60-bit md5-prefix contract") {
    val bytes = "not an image".getBytes("UTF-8")
    val h = Multimodal.perceptualHash(mediaDf((7L, bytes)))
      .collect().head
    assert(!h.is_image)
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(h.phash === java.lang.Long.parseLong(hex.substring(0, 15), 16))
    assert(h.phash >= 0L, "60-bit prefix must stay a positive BIGINT")
  }

  // deterministic pseudo-noise PNG — pairwise-distinct dHashes across
  // seeds (asserted below), brightness-shift stable (values ≤ 199, so
  // +40 never clips and luma ORDER is preserved cell for cell)
  private def noisePng(seed: Int, shift: Int = 0): Array[Byte] =
    png((x, y) => (x * 31 + y * 17 + seed * 97) * 7 % 200 + shift)

  private def videoDf(rows: (Long, Array[Byte])*) =
    rows.toDF("doc_id", "content")
      .select(col("doc_id"), lit("video/gfv").as("media_type"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        col("content"))

  test("videoFrameHashes: REAL dHash per decodable keyframe, md5 stub " +
      "only for opaque frames, non-containers hash as one frame") {
    val pngs = (1 to 3).map(noisePng(_))
    val opaque = "raw sensor dump".getBytes("UTF-8")
    val clip = Multimodal.packFrames(pngs :+ opaque)
    val vf = Multimodal.videoFrameHashes(videoDf((1L, clip)))
      .collect().head
    assert(vf.n_frames === 4)
    assert(vf.n_image_frames === 3)
    // frame hashes are exactly {dHash of each png} ∪ {md5 stub of opaque}
    val wantImage = Multimodal.perceptualHash(
      mediaDf(pngs.zipWithIndex.map { case (p, i) => (i.toLong, p) }: _*))
      .collect().map(_.phash).toSet
    assert(wantImage.size === 3, "noise seeds must give distinct dHashes")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(opaque).map("%02x".format(_)).mkString
    val wantStub = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    assert(vf.frame_hashes.toSet === (wantImage + wantStub))
    assert(vf.frame_hashes.toSeq === vf.frame_hashes.toSeq.sorted,
      "hash set must come out sorted for the merge-join verifier")

    // a non-container blob degrades to single-frame semantics
    val single = Multimodal.videoFrameHashes(videoDf((2L, pngs.head)))
      .collect().head
    assert(single.n_frames === 1 && single.n_image_frames === 1)

    // a torn container (truncated mid-frame) refuses the walk and
    // falls back to whole-blob hashing rather than emitting junk frames
    val torn = clip.take(clip.length - 3)
    val tornRow = Multimodal.videoFrameHashes(videoDf((3L, torn)))
      .collect().head
    assert(tornRow.n_frames === 1)
  }

  test("videoNearDupPairs: re-cut + re-encoded clip pairs by frame-set " +
      "Jaccard; unrelated clip stays unpaired") {
    val frames = (1 to 8).map(noisePng(_))
    val clipA = Multimodal.packFrames(frames)
    // the near-dup cut: last frame dropped, frame 3 brightness-shifted
    // (+40 — same dHash, the perceptual part doing real work: zero BYTES
    // of that frame match clip A's)
    val clipB = Multimodal.packFrames(
      frames.take(7).updated(2, noisePng(3, shift = 40)))
    // unrelated clip: disjoint noise seeds → disjoint hash sets
    val clipC = Multimodal.packFrames((11 to 18).map(noisePng(_)))
    val pairs = Multimodal.videoNearDupPairs(
        videoDf((1L, clipA), (2L, clipB), (3L, clipC)),
        minJaccardPpm = 500000L, k = 32, bands = 16, rowsPerBand = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)),
      s"expected exactly the re-cut pair, got $pairs")
    // 7 shared hashes of 8 distinct: 7/8 = 875000 ppm
    assert(pairs.head._3 === 875000L)
  }

  // ------------------------------------------------------- audio

  /** 8-note melody (frequencies in Hz), 16-bit mono PCM at 8 kHz,
    * 17000 samples — gain scales every sample, dither adds bounded
    * deterministic noise.
    */
  private def melody(
      notes: Seq[Double], gain: Double = 1.0, dither: Int = 0): Array[Short] = {
    val rate = 8000
    Array.tabulate[Short](17000) { i =>
      val f = notes(math.min(i / 2125, notes.length - 1))
      val noise = if (dither == 0) 0 else ((i * 2654435761L >>> 20) % (2 * dither + 1) - dither).toInt
      (Math.round(Math.sin(2 * Math.PI * f * i / rate) * 12000 * gain) + noise).toShort
    }
  }

  private def audioDf(rows: (Long, Array[Byte])*) =
    rows.map { case (id, b) =>
      Multimodal.MediaRow(id, "audio/wav", b.length.toLong, b) }.toDF()

  test("readPcmWav: canonical pack/parse round-trip; torn and non-WAV " +
      "bytes refuse (md5 stub path)") {
    val s = melody(Seq(440, 550, 660, 770, 440, 550, 660, 770))
    val wav = Multimodal.packWav(s, 8000)
    val parsed = Multimodal.readPcmWav(wav)
    assert(parsed != null && parsed._2 === 8000)
    assert(parsed._1.toSeq === s.toSeq)
    assert(Multimodal.readPcmWav(wav.take(30)) === null)
    assert(Multimodal.readPcmWav("not audio".getBytes("UTF-8")) === null)
    // truncated data chunk = torn
    assert(Multimodal.readPcmWav(wav.dropRight(5)) === null)
  }

  test("audioFingerprint64: REAL DSP — gain-invariant, dither-robust, " +
      "melody-discriminating") {
    val notesA = Seq(400.0, 850, 550, 1000, 400, 700, 1150, 550)
    val notesB = Seq(1150.0, 400, 1000, 550, 850, 1150, 400, 700)
    val a = Multimodal.audioFingerprint64(melody(notesA), 8000)
    // re-mastered at 0.7 gain: energies scale by 0.49 uniformly — the
    // delta-sign bits barely move (float rounding can nudge near-ties)
    val aQuiet = Multimodal.audioFingerprint64(melody(notesA, gain = 0.7), 8000)
    assert(java.lang.Long.bitCount(a ^ aQuiet) <= 3,
      s"gain re-master moved ${java.lang.Long.bitCount(a ^ aQuiet)} bits")
    // small additive dither: in-band energies dominate, bits hold
    val aDither = Multimodal.audioFingerprint64(
      melody(notesA, dither = 8), 8000)
    assert(java.lang.Long.bitCount(a ^ aDither) <= 3,
      s"dither moved ${java.lang.Long.bitCount(a ^ aDither)} bits")
    // a different melody flips band-delta signs throughout
    val b = Multimodal.audioFingerprint64(melody(notesB), 8000)
    assert(java.lang.Long.bitCount(a ^ b) > 10,
      s"different melodies only ${java.lang.Long.bitCount(a ^ b)} bits apart")
  }

  test("audioNearDupPairs: re-gained twin pairs, different melody and " +
      "opaque bytes stay unpaired") {
    val notesA = Seq(400.0, 850, 550, 1000, 400, 700, 1150, 550)
    val notesB = Seq(1150.0, 400, 1000, 550, 850, 1150, 400, 700)
    val rows = audioDf(
      (1L, Multimodal.packWav(melody(notesA), 8000)),
      (2L, Multimodal.packWav(melody(notesA, gain = 0.6), 8000)),
      (3L, Multimodal.packWav(melody(notesB), 8000)),
      (4L, "opaque bytes, not a wav".getBytes("UTF-8")))
    val fps = Multimodal.audioFingerprints(rows)
      .select(col("doc_id"), col("is_audio")).as[(Long, Boolean)]
      .collect().toMap
    assert(fps === Map(1L -> true, 2L -> true, 3L -> true, 4L -> false))
    val pairs = Multimodal.audioNearDupPairs(rows, maxDist = 3)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L)), s"got $pairs")
  }

  test("fixtureMelody: all 64 oracle-fixture melodies fingerprint " +
      "pairwise beyond the Hamming<=3 banding radius, and the " +
      "half-gain twin is bit-identical") {
    // the round-10 fixture overran its digit space (ids 25-39 duplicated
    // 0-14's melodies) and 150 Hz steps left near-collisions inside the
    // banding radius; this pins the redesigned fixture's separation
    // contract over the FULL injective range, not just the 40 ids the
    // registered query draws
    val fps = (0 until 64).map { id =>
      Multimodal.audioFingerprint64(
        Multimodal.fixtureMelody(id.toLong), 8000)
    }
    assert(fps.distinct.size === 64, "fixture melodies must be injective")
    var minDist = 64
    for (a <- 0 until 64; b <- (a + 1) until 64) {
      val d = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if (d < minDist) minDist = d
      assert(d > 3, s"ids $a and $b only $d bits apart (banding radius 3)")
    }
    info(s"min pairwise Hamming distance over C(64,2) pairs: $minDist")
    // exact power-of-two gain scaling: twin fingerprints bit-identical
    (0 until 64 by 7).foreach { id =>
      val s = Multimodal.fixtureMelody(id.toLong)
      val half = s.map(v => (v / 2).toShort)
      assert(Multimodal.audioFingerprint64(half, 8000) === fps(id),
        s"half-gain twin of id $id moved bits")
    }
  }
}
