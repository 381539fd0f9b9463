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

  /** Extracted features (what a real decoder would produce). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: String)

  /** Bind the documents corpus as a media table: text bytes stand in for
    * encoded media; metadata computed without touching downstream stages.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      col("text").cast("binary").as("content"))

  /** Columnar metadata pass — blob statistics WITHOUT decoding: length,
    * checksum, and deterministic pseudo-dimensions. Pure expressions, so
    * parquet column pruning keeps this scan cheap and the DuckDB oracle can
    * verify it.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      col("n_bytes"),
      md5(col("content")).as("checksum"),
      ((col("n_bytes") % 640) + 1).cast("int").as("width"),
      (((col("n_bytes") * 7) % 480) + 1).cast("int").as("height"),
      // integer div (not `/`): Spark casts double→int by truncation but
      // DuckDB by rounding — `div`/`//` sidesteps the divergence
      (expr("n_bytes div 128") + 1).cast("int").as("n_frames"))

  /** Decoder: real image decode via the JDK's ImageIO when the blob IS an
    * image (PNG/JPEG/GIF/BMP — true width/height from the pixels);
    * deterministic pseudo-features otherwise (standing in for the
    * audio/video codecs this environment lacks — clearly-marked STUB
    * branch). Everything around it (per-partition init, batch iteration,
    * output schema) is the production shape either way.
    */
  private[operators] def decodeOne(codecHandle: AnyRef, row: MediaRow): MediaFeatures = {
    val _ = codecHandle
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(row.content))
      catch { case _: Throwable => null }
    val (w, h, frames) =
      if (img != null) (img.getWidth, img.getHeight, 1)
      else (
        // >>> STUB: non-image media (audio/video) — deterministic fake
        //     dimensions; a real deployment calls the codec here. <<<
        (row.n_bytes % 640 + 1).toInt,
        (row.n_bytes * 7 % 480 + 1).toInt,
        (row.n_bytes / 128 + 1).toInt)
    MediaFeatures(
      doc_id = row.doc_id,
      media_type = if (img != null) "image" else row.media_type,
      n_bytes = row.n_bytes,
      width = w,
      height = h,
      n_frames = frames,
      checksum = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(row.content).map(b => f"$b%02x").mkString
      })
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
