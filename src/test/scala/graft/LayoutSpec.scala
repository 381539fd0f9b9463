package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sinks.Sink

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  // full 256x256 grid: every (x, y) pair exactly once
  private def grid = spark.range(0, 65536)
    .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))

  test("interleaveBits: known Morton codes") {
    val rows = Seq((1L, 0L), (0L, 1L), (3L, 3L), (0L, 0L), (255L, 0L))
      .toDF("a", "b")
      .select(Layout.interleaveBits(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(_.getLong(0))
    // bit b of col i → position 2b+i: (1,0)→1, (0,1)→2, (3,3)→15,
    // (255,0)→0b0101010101010101=21845
    assert(rows.toSeq === Seq(1L, 2L, 15L, 0L, 21845L))
  }

  test("census: tiles are boxes, point probe keeps exactly one tile") {
    val census = Layout.zorderSkippingCensus(
      grid, Seq("x", "y"), Map("x" -> 10L, "y" -> 200L),
      bits = 8, tileBits = 6).cache()
    try {
      assert(census.count() === 64)
      // top-6 z bits on a full 16-bit grid → every tile is a 32x32 box
      census.collect().foreach { r =>
        assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") === 31L)
        assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") === 31L)
        assert(r.getAs[Long]("n_rows") === 1024L)
      }
      // the probe point lives in exactly one box → 63 of 64 skippable
      assert(census.filter(col("skippable")).count() === 63)
      // locality scalar: ~31/255 ≈ 121k ppm on BOTH axes
      val spans = Layout.tileSpanPpm(census, Seq("x", "y")).collect()(0)
      assert(spans.getAs[Long]("span_ppm_x") === spans.getAs[Long]("span_ppm_y"))
      assert(spans.getAs[Long]("span_ppm_x") < 130000L)
    } finally census.unpersist()
  }

  test("writeZOrdered: per-file locality on EVERY z column beats lexicographic") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      Sink.writeZOrdered(grid, s"$dir/z", Seq("x", "y"), nFiles = 16)
      grid.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions("x", "y")
        .write.parquet(s"$dir/lex")

      def meanSpanFrac(path: String): (Double, Double) = {
        val files = new java.io.File(path).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.toString)
        assert(files.length > 8)
        val spans = files.map { f =>
          val r = spark.read.parquet(f)
            .agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
          ((r.getLong(1) - r.getLong(0)) / 255.0,
            (r.getLong(3) - r.getLong(2)) / 255.0)
        }
        (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
      }
      val (zx, zy) = meanSpanFrac(s"$dir/z")
      val (lx, ly) = meanSpanFrac(s"$dir/lex")
      // z-order: both axes localized; lexicographic: x localized but y
      // spans ~the full range in every file
      assert(zx < 0.5, s"z-order x span $zx")
      assert(zy < 0.5, s"z-order y span $zy")
      assert(ly > 0.9, s"lexicographic y span $ly should be ~full")
      assert(zy < ly / 2, s"z-order y $zy must beat lexicographic y $ly")
      // layout changes bytes on disk, never rows: content identical
      assert(spark.read.parquet(s"$dir/z").orderBy("x", "y").collect().toSeq ===
        grid.orderBy("x", "y").collect().toSeq)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
