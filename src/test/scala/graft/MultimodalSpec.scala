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

  test("columnar metadata matches the mapPartitions decode stub") {
    val cols = Multimodal.metadata(media)
      .orderBy("doc_id")
      .select("doc_id", "n_bytes", "width", "height", "n_frames", "checksum")
      .as[(Long, Long, Int, Int, Int, String)].collect()
    val decoded = Multimodal.decodeFeatures(media)
      .orderBy("doc_id")
      .select("doc_id", "n_bytes", "width", "height", "n_frames", "checksum")
      .as[(Long, Long, Int, Int, Int, String)].collect()
    assert(cols.toSeq === decoded.toSeq)
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
    assert((f.width, f.height, f.n_frames) === ((17, 11, 1)))
    assert(f.media_type === "image")
    // text bytes take the deterministic non-image path
    val t = Multimodal.decodeFeatures(
      Multimodal.asMedia(Tables.documents(spark, sf).limit(1))).collect()(0)
    assert(t.media_type === "text/plain")
    assert(t.width === (t.n_bytes % 640 + 1).toInt)
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
    assert((r.orig_w, r.orig_h) === ((400, 300)))
    assert((r.width, r.height) === ((224, 168)))
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
    assert((r2.width, r2.height) === ((17, 11)))
  }

  test("resizePlan: columnar plan equals the codec stage's fit on stubs") {
    val media = Multimodal.asMedia(Tables.documents(spark, sf).limit(50))
    val plan = Multimodal.resizePlan(Multimodal.metadata(media))
      .select($"doc_id", $"target_w", $"target_h")
      .as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val staged = Multimodal.resize(media).collect()
      .map(r => r.doc_id -> ((r.width, r.height))).toMap
    assert(plan.view.mapValues(identity).toMap ===
      staged.view.mapValues(identity).toMap,
      "plan dims must equal the mapPartitions fit")
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
}
