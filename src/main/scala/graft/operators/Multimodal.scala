package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** North-star multimodal-column plumbing: media as opaque `binary` columns
  * with typed metadata, plus a decode/feature-extract stage whose Spark-side
  * shape (schema, partitioning, per-partition batching) is real while the
  * actual codec is STUBBED — image/audio libraries are not available in
  * this environment, so the decoder is a deterministic fake, clearly marked.
  *
  * At 100 TB the pattern is: keep blobs in their own column (parquet stores
  * them out-of-line per page; column pruning means metadata-only queries
  * never touch bytes), decode with a per-partition-initialized codec inside
  * `mapPartitions` (the resource-per-partition idiom — SURVEY.md §4's
  * Lua-state-per-worker analog), and emit fixed-schema features.
  */
object Multimodal {

  /** Media row: blob + envelope metadata. */
  final case class MediaRow(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      content: Array[Byte])

  /** Extracted features (what a real decoder would produce). Dimensions
    * are OPTIONAL: they exist only when the decoder actually ran
    * (`decoded = true`); undecodable media surface null dims, never
    * deterministic fakes — a downstream consumer must be able to tell
    * "measured" from "made up".
    */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Option[Int],
      height: Option[Int],
      n_frames: Option[Int],
      checksum: String,
      decoded: Boolean)

  /** Bind the documents corpus as a media table: text bytes stand in for
    * encoded media; metadata computed without touching downstream stages.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      col("text").cast("binary").as("content"))

  /** Columnar metadata pass — blob statistics WITHOUT decoding: length
    * and checksum only. Pure expressions, so parquet column pruning
    * keeps this scan cheap and the DuckDB oracle can verify it.
    * Dimensions deliberately do NOT appear here: a columnar pass cannot
    * measure pixels, and earlier rounds' deterministic pseudo-dimensions
    * let fake numbers masquerade as data — dims come from
    * [[decodeFeatures]] (null + `decoded = false` when no codec applies).
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      col("n_bytes"),
      md5(col("content")).as("checksum"))

  /** Decoder: real image decode via the JDK's ImageIO when the blob IS an
    * image (PNG/JPEG/GIF/BMP — true width/height from the pixels);
    * undecodable media get NULL dimensions and `decoded = false` — never
    * deterministic fakes (earlier rounds synthesized pseudo-dims here,
    * which let made-up numbers flow downstream as data). A real
    * deployment swaps additional codecs into this branch. Everything
    * around it (per-partition init, batch iteration, output schema) is
    * the production shape either way.
    */
  private[operators] def decodeOne(codecHandle: AnyRef, row: MediaRow): MediaFeatures = {
    val _ = codecHandle
    val img = readImage(row.content)
    val checksum = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(row.content).map(b => f"$b%02x").mkString
    }
    if (img != null)
      MediaFeatures(row.doc_id, "image", row.n_bytes,
        Some(img.getWidth), Some(img.getHeight), Some(1), checksum,
        decoded = true)
    else
      // no codec for these bytes in this environment — surface honest
      // nulls (a production deploy plugs audio/video decoders in above)
      MediaFeatures(row.doc_id, row.media_type, row.n_bytes,
        None, None, None, checksum, decoded = false)
  }

  /** Decode/feature-extract via mapPartitions: the codec is initialized
    * once per partition (expensive-resource idiom), rows stream through it.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.as(Encoders.product[MediaRow]).mapPartitions { rows =>
      // >>> STUB: per-partition codec init (real: load native lib once). <<<
      val codecHandle: AnyRef = new Object
      rows.map(r => decodeOne(codecHandle, r))
    }
  }

  /** Aspect-fit resize PLAN: target dimensions that fit (width, height)
    * into a maxW×maxH box without distortion, in PURE INTEGER arithmetic
    * (products + integer div — no float scale factor to round
    * differently anywhere), so the plan is columnar, cheap, and
    * oracle-checkable. Rows already inside the box pass through
    * unchanged. The pixel work happens in [[resize]]; this plan is what
    * a 100 TB job uses to partition/estimate before touching bytes.
    */
  def resizePlan(meta: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val fits = w <= maxW && h <= maxH
    // width is the binding constraint iff w/maxW >= h/maxH ⟺ w*maxH >= h*maxW
    val widthBinding = w * maxH >= h * maxW
    meta
      .withColumn("target_w",
        when(fits, w)
          .when(widthBinding, lit(maxW.toLong))
          .otherwise(greatest(lit(1L),
            expr(s"CAST(width AS BIGINT) * $maxH div height")))
          .cast("int"))
      .withColumn("target_h",
        when(fits, h)
          .when(widthBinding, greatest(lit(1L),
            expr(s"CAST(height AS BIGINT) * $maxW div width")))
          .otherwise(lit(maxH.toLong))
          .cast("int"))
  }

  /** Resized media row: original + target dims, re-encoded bytes.
    * Dims are null when no codec applied ([[MediaFeatures]]'s stance) —
    * such rows pass through byte-identical with `resized = false`.
    */
  final case class ResizedMedia(
      doc_id: Long,
      media_type: String,
      orig_w: Option[Int],
      orig_h: Option[Int],
      width: Option[Int],
      height: Option[Int],
      n_bytes: Long,
      content: Array[Byte],
      resized: Boolean)

  /** Pixel resize in the per-partition codec stage: REAL for decodable
    * images (Graphics2D bilinear scale to the aspect-fit box, PNG
    * re-encode); undecodable media pass through BYTE-IDENTICAL with null
    * dims and `resized = false` (a real deployment calls the video/audio
    * scaler here — passing fabricated dims downstream is worse than
    * admitting the codec didn't run). The Spark-side shape —
    * mapPartitions, one codec init per partition, fixed output schema —
    * is production either way.
    */
  def resize(
      media: DataFrame,
      maxW: Int = 224,
      maxH: Int = 224): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    def fit(w: Long, h: Long): (Int, Int) =
      if (w <= maxW && h <= maxH) (w.toInt, h.toInt)
      else if (w * maxH >= h * maxW)
        (maxW, math.max(1L, h * maxW / w).toInt)
      else (math.max(1L, w * maxH / h).toInt, maxH)
    media.as(Encoders.product[MediaRow]).mapPartitions { rows =>
      // >>> STUB: per-partition codec init (real: load native lib once). <<<
      val codecHandle: AnyRef = new Object
      val _ = codecHandle
      rows.map { r =>
        val img = readImage(r.content)
        if (img != null) {
          val (tw, th) = fit(img.getWidth.toLong, img.getHeight.toLong)
          val out = new java.awt.image.BufferedImage(
            tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, tw, th, null)
          g.dispose()
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", buf)
          val bytes = buf.toByteArray
          ResizedMedia(r.doc_id, "image",
            Some(img.getWidth), Some(img.getHeight), Some(tw), Some(th),
            bytes.length.toLong, bytes, resized = true)
        } else {
          // no codec for these bytes — byte-identical passthrough,
          // honest nulls (see scaladoc)
          ResizedMedia(r.doc_id, r.media_type, None, None, None, None,
            r.n_bytes, r.content, resized = false)
        }
      }
    }
  }

  /** Parse image dimensions from the CONTAINER HEADER alone — PNG IHDR,
    * GIF logical screen, BMP BITMAPINFOHEADER, JPEG SOF segment, TIFF
    * first-IFD (tags 256/257, both endiannesses) — no pixel decode: the
    * metadata pass a 100 TB corpus can afford. A full
    * `ImageIO.read` inflates every pixel to get the same two ints (the
    * sniff receipt in [[looksLikeImage]] measured the decode path at
    * ~2 ms/row; the header parse is a few dozen byte reads). Covers
    * exactly the [[looksLikeImage]] sniff list, so the cheap metadata
    * pass and the decoder can never disagree about a format again (a
    * round-11 TIFF admitted to the decoder but not walked here returned
    * `probed = false` next to real decode features — inconsistent).
    * Returns `(format, width, height)` or None for torn headers /
    * unknown bytes — None, never a guess, the [[MediaFeatures]] honesty
    * stance.
    */
  private[graft] def headerDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    def u16be(p: Int) = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    def u16le(p: Int) = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def i32be(p: Int) = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    def i32le(p: Int) = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    if (b.length >= 24 && b(0) == 0x89.toByte && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && b(12) == 'I' && b(13) == 'H' &&
        b(14) == 'D' && b(15) == 'R') {
      val (w, h) = (i32be(16), i32be(20))
      if (w > 0 && h > 0) Some(("png", w, h)) else None
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == '8') {
      val (w, h) = (u16le(6), u16le(8))
      if (w > 0 && h > 0) Some(("gif", w, h)) else None
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' &&
        i32le(14) >= 40) { // BITMAPINFOHEADER and successors
      val w = i32le(18)
      val h = math.abs(i32le(22)) // negative = top-down row order
      if (w > 0 && h > 0) Some(("bmp", w, h)) else None
    } else if (b.length >= 4 && b(0) == 0xff.toByte &&
        b(1) == 0xd8.toByte) {
      // JPEG: walk segments to the first SOFn (C0-CF except C4/C8/CC)
      var p = 2
      while (p + 3 < b.length) {
        if (b(p) != 0xff.toByte) return None // lost sync: torn stream
        var q = p
        while (q + 1 < b.length && b(q + 1) == 0xff.toByte) q += 1 // fill
        if (q + 1 >= b.length) return None // fill bytes ran to EOF: torn
        val marker = b(q + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (q + 8 >= b.length) return None
          val (h, w) = (u16be(q + 5), u16be(q + 7))
          return if (w > 0 && h > 0) Some(("jpeg", w, h)) else None
        } else if (marker >= 0xd0 && marker <= 0xd9) {
          p = q + 2 // standalone marker, no length field
        } else {
          if (q + 3 >= b.length) return None
          p = q + 2 + u16be(q + 2)
        }
      }
      None
    } else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a.toByte && b(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a.toByte))) {
      // TIFF: walk the FIRST IFD only — ImageWidth (tag 256) and
      // ImageLength (tag 257) live there as SHORT or LONG count-1
      // entries with the value inline in the 4-byte value field (first
      // 2 bytes for SHORT, in the file's endianness). Every offset is
      // bounds-checked: torn streams yield None, never a guess
      val le = b(0) == 'I'
      def u16(p: Int) = if (le) u16le(p) else u16be(p)
      def u32(p: Int): Long =
        (if (le) i32le(p) else i32be(p)).toLong & 0xffffffffL
      val ifd = u32(4)
      if (ifd < 8L || ifd + 2L > b.length.toLong) None
      else {
        val base = ifd.toInt
        val n = u16(base)
        var (w, h) = (0L, 0L)
        var i = 0
        while (i < n) {
          val e = base + 2 + i * 12
          if (e + 12 > b.length) return None // torn entry table
          val (tag, typ, cnt) = (u16(e), u16(e + 2), u32(e + 4))
          if ((tag == 256 || tag == 257) && cnt == 1L) {
            val v =
              if (typ == 3) u16(e + 8).toLong // SHORT, inline
              else if (typ == 4) u32(e + 8)   // LONG, inline
              else return None // a dims tag in an unexpected type: bail
            if (tag == 256) w = v else h = v
          }
          i += 1
        }
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(("tiff", w.toInt, h.toInt))
        else None
      }
    } else None
  }

  /** Header-probe row: dims measured from the container header (real
    * bytes, no pixel decode); `probed = false` + nulls when no known
    * header matches.
    */
  final case class HeaderProbe(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      format: Option[String],
      width: Option[Int],
      height: Option[Int],
      probed: Boolean)

  /** The header-only metadata pass — dims for PNG/GIF/BMP/JPEG from a
    * few dozen header bytes per blob, the scan-affordable middle ground
    * between [[metadata]] (no dims at all) and [[decodeFeatures]]
    * (full pixel decode): at corpus scale the metadata question
    * ("what are the dims / is the aspect ratio sane / which resize
    * bucket") must not inflate every pixel. Same honesty contract:
    * unknown or torn headers surface nulls + `probed = false`, never a
    * fabricated number.
    */
  def headerProbe(media: DataFrame): Dataset[HeaderProbe] = {
    implicit val enc = Encoders.product[HeaderProbe]
    media.as(Encoders.product[MediaRow]).mapPartitions { rows =>
      rows.map { r =>
        headerDims(r.content) match {
          case Some((fmt, w, h)) =>
            HeaderProbe(r.doc_id, r.media_type, r.n_bytes,
              Some(fmt), Some(w), Some(h), probed = true)
          case None =>
            HeaderProbe(r.doc_id, r.media_type, r.n_bytes,
              None, None, None, probed = false)
        }
      }
    }
  }

  /** Cheap magic-byte sniff for the formats ImageIO can decode here
    * (PNG / JPEG / GIF / BMP). Calling `ImageIO.read` on arbitrary bytes
    * costs ~2 ms per row (ImageInputStream setup + reader scan + the
    * exception path), which at corpus scale turns a hash pass into a
    * codec-probe pass — measured 107 s → 3 s on the 50k-doc ScaleCheck
    * probe. The sniff is a few byte compares; only blobs that actually
    * look like images reach the decoder.
    */
  private[operators] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      // PNG \x89PNG
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      // JPEG \xFF\xD8\xFF
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
      // GIF87a / GIF89a
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      // BMP "BM"
      (b(0) == 'B' && b(1) == 'M') ||
      // TIFF little-endian II*\0 / big-endian MM\0* (JDK ImageIO decodes
      // TIFF since 9 — without these magics the sniff would silently
      // reroute decodable TIFFs to the stub branch)
      (b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a.toByte && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a.toByte))

  /** THE guarded decode — sniff first (cheap byte compares), ImageIO only
    * on plausible image bytes, null on anything undecodable. Every image
    * call site goes through here so the sniff/decoder pair can never
    * drift apart again (the 107 s → 3 s ScaleCheck lesson).
    *
    * ACCEPTED-FORMAT CONTRACT: the sniff admits exactly PNG / JPEG /
    * GIF / BMP / TIFF — the JDK-decodable formats WITH a magic
    * signature. A JDK-decodable format with no reliable signature (WBMP
    * is the one that ships with ImageIO) returns null here and routes to
    * each caller's stub/fallback branch, the same path as any non-image
    * blob. If a target corpus carries such formats, extend
    * [[looksLikeImage]] with their signatures (or an explicit
    * `media_type` gate) — decode behavior is the SNIFF LIST, not
    * `ImageIO.getReaderFormatNames`.
    */
  private[operators] def readImage(b: Array[Byte]): java.awt.image.BufferedImage =
    if (!looksLikeImage(b)) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case _: Throwable => null }

  /** Perceptual-hash row. `is_image` marks the REAL-pixel branch. */
  final case class MediaHash(
      doc_id: Long,
      media_type: String,
      is_image: Boolean,
      phash: Long)

  /** Perceptual hash per media row — the signature that powers IMAGE
    * near-dup detection (recompressed / resized / lightly-edited copies
    * share most bits where a byte checksum shares none).
    *
    * For decodable images the hash is a REAL dHash over the pixels
    * (JDK-only): bilinear-downscale to 9×8, integer Rec.601 luma per
    * cell, bit (x, y) = luma(x, y) > luma(x+1, y) — 64 gradient-sign
    * bits, robust to re-encoding and uniform brightness shifts because
    * only left-right luma ORDER survives into the hash.
    *
    * Non-image media take the clearly-marked STUB branch (no audio/video
    * codecs in this environment): the top 15 hex chars of md5(content) as
    * a 60-bit integer — a deterministic, SQL-replayable stand-in (a real
    * deployment puts a chromaprint/video-sketch here). Stub hashes are
    * effectively random, so only EXACT byte duplicates land within any
    * small Hamming radius — which makes the stub path's pair semantics
    * exact-dup detection, oracle-checkable end to end, while the image
    * path's near-dup semantics is spec-verified on real generated PNGs.
    *
    * 100 TB shape: one mapPartitions decode pass (codec-per-partition
    * idiom) emitting 16-byte rows; pairing is [[Dedup.hammingPairs64]] —
    * banded buckets, never all-pairs.
    */
  /** Real 64-bit dHash over decoded pixels: bilinear-downscale to 9×8,
    * integer Rec.601 luma per cell, bit (x, y) = luma(x, y) >
    * luma(x+1, y) — only left-right luma ORDER survives into the hash,
    * so re-encodes and uniform brightness shifts keep most bits. Shared
    * by the whole-image path ([[perceptualHash]]) and the per-keyframe
    * video path ([[videoFrameHashes]]).
    */
  private[operators] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val scaled = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = scaled.createGraphics()
    g.setRenderingHint(
      java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 9, 8, null)
    g.dispose()
    def luma(x: Int, y: Int): Int = {
      val rgb = scaled.getRGB(x, y)
      // integer Rec.601: deterministic, no float rounding
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
    }
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x, y) > luma(x + 1, y)) h |= (1L << bit)
        bit += 1; x += 1
      }
      y += 1
    }
    h
  }

  /** 60-bit md5-prefix content hash — the clearly-marked STUB for truly
    * opaque bytes (no codec can see inside): deterministic and
    * SQL-replayable (15 hex nibbles fit a positive BIGINT in both
    * engines).
    */
  private[operators] def md5Hash60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(bytes).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def perceptualHash(media: DataFrame): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    media.as(Encoders.product[MediaRow]).mapPartitions { rows =>
      // >>> STUB: per-partition codec init (real: load native lib once). <<<
      val codecHandle: AnyRef = new Object
      val _ = codecHandle
      rows.map { r =>
        val img = readImage(r.content)
        if (img != null)
          MediaHash(r.doc_id, "image", is_image = true, phash = dHash64(img))
        else
          // >>> STUB: opaque bytes — md5 prefix (see md5Hash60). <<<
          MediaHash(r.doc_id, r.media_type, is_image = false,
            phash = md5Hash60(r.content))
      }
    }
  }

  /** Near-duplicate media pairs by perceptual-hash Hamming distance —
    * [[Dedup.hammingPairs64]] banding over [[perceptualHash]] signatures:
    * 4×16-bit band buckets (pigeonhole-complete for Hamming ≤ 3), pairs
    * emitted exactly once, never an all-pairs join. Image rows pair by
    * REAL pixel-gradient similarity; stub rows pair only on content-hash
    * equality (see [[perceptualHash]]).
    */
  def imageNearDupPairs(
      media: DataFrame,
      maxDist: Int = 3,
      salts: Int = 4): DataFrame = {
    val sigs = perceptualHash(media)
      .select(col("doc_id"), col("phash").as("sh"))
    Dedup.hammingPairs64(sigs, maxDist, salts)
  }

  // ------------------------------------------------------- video hashing

  /** Magic bytes of the length-prefixed frame container this module's
    * video path understands — the MJPEG/IVF-style shape: magic, then per
    * frame a 4-byte big-endian length + the frame bytes. A real pipeline
    * swaps [[unpackFrames]] for the container demuxer (mp4/mkv); the
    * downstream hashing is codec-agnostic either way.
    */
  private val VideoMagic: Array[Byte] = "GFV1".getBytes("US-ASCII")

  /** Pack frames into the container (fixture/ingest helper). */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(VideoMagic)
    frames.foreach { f =>
      out.write(Array[Byte](
        (f.length >> 24).toByte, (f.length >> 16).toByte,
        (f.length >> 8).toByte, f.length.toByte))
      out.write(f)
    }
    out.toByteArray
  }

  /** Frames of a container blob; null when the blob is not a container
    * (callers then treat the whole blob as a single frame — images and
    * opaque bytes degrade gracefully to the single-frame semantics).
    */
  private[operators] def unpackFrames(b: Array[Byte]): Seq[Array[Byte]] = {
    if (b.length < 4 || !(0 until 4).forall(i => b(i) == VideoMagic(i)))
      return null
    val frames = Seq.newBuilder[Array[Byte]]
    var p = 4
    while (p + 4 <= b.length) {
      val len = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (len < 0 || p + 4 + len > b.length) return null // torn container
      frames += java.util.Arrays.copyOfRange(b, p + 4, p + 4 + len)
      p += 4 + len
    }
    if (p != b.length) null else frames.result()
  }

  /** Per-video frame-hash row: the sorted DISTINCT set of per-frame
    * perceptual hashes, the real VIDEO signature — near-dup clips (a
    * re-cut with dropped/reordered frames, re-encoded keyframes) share
    * most FRAME hashes even when no byte of the containers matches.
    */
  final case class VideoFrameHashes(
      doc_id: Long,
      n_frames: Int,
      n_image_frames: Int,
      frame_hashes: Array[Long])

  /** Decode-and-hash pass for video containers: walk the frames, REAL
    * [[dHash64]] for every decodable keyframe (re-encode/brightness
    * robust — the honest perceptual part), [[md5Hash60]] only for truly
    * opaque frame bytes (STUB semantics: such frames match on exact
    * content only). Non-container blobs hash as a single frame, so the
    * operator is total over any media table. One mapPartitions pass
    * (codec-per-partition idiom) emitting bounded rows — the set is
    * distinct-sorted in place, never a per-frame shuffle.
    */
  def videoFrameHashes(media: DataFrame): Dataset[VideoFrameHashes] = {
    implicit val enc = Encoders.product[VideoFrameHashes]
    media.as(Encoders.product[MediaRow]).mapPartitions { rows =>
      // >>> STUB: per-partition codec init (real: load native lib once). <<<
      val codecHandle: AnyRef = new Object
      val _ = codecHandle
      rows.map { r =>
        val frames = unpackFrames(r.content) match {
          case null => Seq(r.content)
          case fs => fs
        }
        var nImg = 0
        val hashes = frames.map { f =>
          val img = readImage(f)
          if (img != null) { nImg += 1; dHash64(img) }
          else md5Hash60(f) // >>> STUB: opaque frame bytes <<<
        }
        VideoFrameHashes(r.doc_id, frames.size, nImg,
          hashes.distinct.sorted.toArray)
      }
    }
  }

  /** Near-duplicate VIDEO pairs by frame-hash-set Jaccard — the judge of
    * "same clip, different cut/encode": signatures are MinHash over the
    * frame-hash set, candidates come from banded LSH buckets (never
    * all-pairs — [[Dedup.lshCandidates]], the text-dedup blocking engine
    * reused verbatim), and every candidate is verified with the EXACT
    * sorted-merge Jaccard of the frame-hash sets. Output
    * `(doc_a, doc_b, jaccard_ppm)` for pairs ≥ `minJaccardPpm`.
    *
    * 100 TB shape: one decode pass → (doc, k-long signature) rows; the
    * bands× inflation carries ids only; verification touches candidate
    * pairs' hash arrays (frame-count-bounded), not pixels.
    */
  def videoNearDupPairs(
      media: DataFrame,
      minJaccardPpm: Long = 500000L,
      k: Int = 32,
      bands: Int = 8,
      rowsPerBand: Int = 4): DataFrame = {
    val fh = videoFrameHashes(media)
      .select(col("doc_id"), col("frame_hashes").as("sh"))
    val signed = fh.select(col("doc_id"),
      graft.functions.MinHash.minhash_sig(col("sh"), k).as("sig"))
    val cand = Dedup.lshCandidates(signed, bands, rowsPerBand)
    val a = fh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = fh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand
      .join(a, "doc_a").join(b, "doc_b")
      .withColumn("__inter", graft.functions.SortedIntersect
        .sorted_intersect_size(col("sh_a"), col("sh_b")).cast("long"))
      .withColumn("jaccard_ppm", expr(
        "(__inter * 1000000) div (size(sh_a) + size(sh_b) - __inter)"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("doc_a"), col("doc_b"), col("jaccard_ppm"))
  }

  // ------------------------------------------------------- audio hashing

  /** Parse a canonical RIFF/WAVE blob: PCM (format 1), 16-bit samples,
    * first channel only. Returns (samples, sampleRate), or null when the
    * bytes are not such a WAV (callers route those to the md5 stub, the
    * same graceful degradation as [[readImage]]). This is a REAL decoder
    * for the one audio container the JDK can honestly handle without
    * native codecs — compressed formats (mp3/aac/opus) are exactly the
    * swap-point a production deploy fills with a native lib, like
    * [[unpackFrames]]'s demuxer note.
    */
  private[graft] def readPcmWav(b: Array[Byte]): (Array[Short], Int) = {
    def u16(p: Int) = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    def u32(p: Int) = (b(p) & 0xff).toLong | ((b(p + 1) & 0xff).toLong << 8) |
      ((b(p + 2) & 0xff).toLong << 16) | ((b(p + 3) & 0xff).toLong << 24)
    if (b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'))
      return null
    var p = 12
    var rate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    while (p + 8 <= b.length) {
      val id = new String(b, p, 4, "US-ASCII")
      val len = u32(p + 4).toInt
      if (len < 0 || p + 8 + len > b.length) return null // torn chunk
      id match {
        case "fmt " =>
          if (len < 16) return null
          if (u16(p + 8) != 1) return null // PCM only
          channels = u16(p + 10)
          rate = u32(p + 12).toInt
          bits = u16(p + 22)
          if (channels < 1 || rate <= 0 || bits != 16) return null
        case "data" =>
          if (channels < 1) return null // data before fmt: malformed
          val n = len / (2 * channels)
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { // first channel of each frame
            val q = p + 8 + i * 2 * channels
            samples(i) = ((b(q) & 0xff) | (b(q + 1) << 8)).toShort
            i += 1
          }
        case _ => () // skip LIST/INFO/etc.
      }
      p += 8 + len + (len & 1) // chunks are 2-byte aligned
    }
    if (samples == null || rate == 0) null else (samples, rate)
  }

  /** Pack 16-bit mono PCM into a canonical WAV (fixture/ingest helper,
    * the [[packFrames]] of the audio path).
    */
  def packWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Goertzel in-band power of `samples[from, from+len)` at `freq` —
    * the classic single-bin DFT recurrence (O(len) per band, no FFT
    * needed for 4 bands × 17 frames).
    */
  private def goertzelPower(
      samples: Array[Short], from: Int, len: Int,
      freq: Double, rate: Int): Double = {
    val w = 2.0 * Math.PI * freq / rate
    val coeff = 2.0 * Math.cos(w)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
    var i = from
    val end = from + len
    while (i < end) {
      s0 = samples(i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Energy bands of the audio fingerprint: log-spaced through the
    * speech/music range.
    */
  private val AudioBands = Array(300.0, 700.0, 1500.0, 3000.0)

  /** Deterministic fixture melody for the audio near-dup oracle,
    * designed AGAINST the delta-coded fingerprint: [[audioFingerprint64]]
    * only records frame-to-frame energy ORDER, so a melody scheme must
    * encode ids in band TRANSITIONS, not absolute tones (round 10's
    * digit-to-frequency map let constant melodies — and any two ids with
    * the same change pattern — collide). Return-to-reference coding: 8
    * notes alternate digit/reference — notes 0/2/4/6 carry the three
    * base-4 digits of `id` plus a mod-4 checksum digit, each at the
    * EXACT [[AudioBands]] center it selects; notes 1/3/5/7 return to a
    * fixed 1200 Hz reference, so every digit note enters and exits
    * through band transitions that encode its absolute band. The
    * checksum slot makes any two distinct ids differ in ≥ 2 of the 4
    * digit slots (one differing base-4 digit forces the checksum to
    * differ too). Injective over id < 64; measured min pairwise
    * fingerprint distance over all C(64,2) pairs = 8 bits — well beyond
    * the Hamming≤3 banding radius (pinned by MultimodalSpec). Every
    * sample is even (2 × round(...)) so an exactly-half-gain twin
    * divides exactly and fingerprints bit-identically (power-of-two
    * scaling is exact through the Goertzel recurrence).
    */
  private[graft] def fixtureMelody(
      id: Long, nSamples: Int = 17000, rate: Int = 8000): Array[Short] = {
    val d0 = (id & 3L).toInt
    val d1 = ((id >> 2) & 3L).toInt
    val d2 = ((id >> 4) & 3L).toInt
    val slots = Array(d0, d1, d2, (d0 + d1 + d2) % 4)
    val samples = new Array[Short](nSamples)
    val noteLen = nSamples / 8
    var i = 0
    while (i < samples.length) {
      val j = math.min(i / noteLen, 7)
      val freq = if (j % 2 == 1) 1200.0 else AudioBands(slots(j / 2))
      samples(i) = (2 * Math.round(
        Math.sin(2 * Math.PI * freq * i / rate) * 8191)).toShort
      i += 1
    }
    samples
  }

  /** REAL 64-bit audio fingerprint over decoded PCM, chromaprint-style:
    * split the clip into 17 equal frames, Goertzel energy in 4
    * log-spaced bands per frame, bit (f, b) = E(f, b) > E(f−1, b) — only
    * the temporal ORDER of band energies survives into the hash.
    * Gain-invariant BY CONSTRUCTION: scaling every sample by c scales
    * every energy by c², so all comparisons (and therefore all 64 bits)
    * are unchanged — a re-mastered/re-gained copy of the same material
    * fingerprints identically, while different material flips band-delta
    * signs throughout (spec-driven on synthesized tone sequences).
    */
  private[graft] def audioFingerprint64(
      samples: Array[Short], rate: Int): Long = {
    val nFrames = 17
    val frameLen = samples.length / nFrames
    if (frameLen == 0) return 0L
    val e = Array.ofDim[Double](nFrames, AudioBands.length)
    var f = 0
    while (f < nFrames) {
      var b = 0
      while (b < AudioBands.length) {
        e(f)(b) = goertzelPower(
          samples, f * frameLen, frameLen, AudioBands(b), rate)
        b += 1
      }
      f += 1
    }
    var h = 0L
    var bit = 0
    f = 1
    while (f < nFrames) {
      var b = 0
      while (b < AudioBands.length) {
        if (e(f)(b) > e(f - 1)(b)) h |= (1L << bit)
        bit += 1; b += 1
      }
      f += 1
    }
    h
  }

  /** Per-media audio fingerprint row. `is_audio` = the REAL DSP path ran
    * (decodable PCM WAV); false rows carry the md5 stub and pair only on
    * exact content, the [[perceptualHash]] stance.
    */
  final case class AudioHash(
      doc_id: Long,
      media_type: String,
      is_audio: Boolean,
      ahash: Long)

  /** Decode-and-fingerprint pass for audio: REAL band-energy
    * fingerprints ([[audioFingerprint64]]) for decodable PCM WAV blobs,
    * [[md5Hash60]] only for opaque bytes — closes the audio leg of the
    * multimodal family next to [[perceptualHash]] (images) and
    * [[videoFrameHashes]] (clips). One mapPartitions pass,
    * codec-per-partition idiom.
    */
  def audioFingerprints(media: DataFrame): Dataset[AudioHash] = {
    implicit val enc = Encoders.product[AudioHash]
    media.as(Encoders.product[MediaRow]).mapPartitions { rows =>
      // >>> STUB: per-partition codec init (real: load native lib once). <<<
      val codecHandle: AnyRef = new Object
      val _ = codecHandle
      rows.map { r =>
        readPcmWav(r.content) match {
          case null =>
            // >>> STUB: opaque bytes — md5 prefix (see md5Hash60). <<<
            AudioHash(r.doc_id, r.media_type, is_audio = false,
              ahash = md5Hash60(r.content))
          case (samples, rate) =>
            AudioHash(r.doc_id, "audio", is_audio = true,
              ahash = audioFingerprint64(samples, rate))
        }
      }
    }
  }

  /** Near-duplicate AUDIO pairs by fingerprint Hamming distance — the
    * [[imageNearDupPairs]] of the audio leg: [[Dedup.hammingPairs64]]
    * banding over [[audioFingerprints]], pigeonhole-complete for
    * Hamming ≤ 3, never all-pairs. "Same material, different gain/
    * master" pairs with zero matching bytes; different material stays
    * apart (band-delta signs flip with the melody).
    */
  def audioNearDupPairs(
      media: DataFrame,
      maxDist: Int = 3,
      salts: Int = 4): DataFrame = {
    val sigs = audioFingerprints(media)
      .select(col("doc_id"), col("ahash").as("sh"))
    Dedup.hammingPairs64(sigs, maxDist, salts)
  }

  /** Frame sampling: one row per sampled frame offset — pure expressions
    * (sequence + explode), no decode needed for offset planning.
    */
  def frameSample(media: DataFrame, strideBytes: Int = 128): DataFrame =
    media
      .withColumn("n_frames",
        (expr(s"n_bytes div $strideBytes") + 1).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1))
          .as(Seq("frame_idx", "frame_no")))
      .select(col("doc_id"),
        col("frame_idx"),
        (col("frame_idx") * strideBytes).cast("long").as("byte_offset"))
}
