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

  // heavy-tailed fixture: y = x³ over a uniform lattice — one max-value
  // outlier regime where min-max buckets collapse (median/max = 1/8,
  // and the cube concentrates half the mass in the bottom 1/8 of the
  // range) while equi-depth buckets stay uniform by construction
  private def skewed = spark.range(0, 65536)
    .select((col("id") % 256).as("x"),
      ((col("id") / 256) * (col("id") / 256) * (col("id") / 256))
        .cast("long").as("y"))

  test("quantile z-order: equi-depth buckets spread a heavy tail") {
    val probes = Map("y" -> 2000000L) // y median = 127³ ≈ 2.05M
    val mm = Layout.scanFractionPpm(
      Layout.zorderSkippingCensus(skewed, Seq("x", "y"), probes))
      .collect()(0).getLong(0)
    val qt = Layout.scanFractionPpm(
      Layout.zorderSkippingCensusQuantile(skewed, Seq("x", "y"), probes))
      .collect()(0).getLong(0)
    // min-max: the probe's bucket strip holds ~half the corpus; quantile:
    // one 32-bucket equi-depth strip = ~1/8 of rows
    assert(qt < mm / 2, s"quantile scan $qt ppm must beat min-max $mm ppm")
    assert(qt <= 250000L, s"quantile scan $qt ppm should stay under 1/4")
  }

  test("writeZOrdered(quantile): per-FILE span shrinkage on the skewed axis") {
    val dir = java.nio.file.Files.createTempDirectory("zorderq").toString
    try {
      Sink.writeZOrdered(skewed, s"$dir/qz", Seq("x", "y"), nFiles = 16,
        quantile = true)
      Sink.writeZOrdered(skewed, s"$dir/mm", Seq("x", "y"), nFiles = 16)

      // per-file ROW-COVERAGE of a y median-point probe: the fraction of
      // rows in files whose [min_y, max_y] box contains the probe — the
      // exact decision a parquet reader makes from footer stats
      def probeScanFrac(path: String, probe: Long): Double = {
        val files = new java.io.File(path).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.toString)
        assert(files.length > 8)
        val stats = files.map { f =>
          val r = spark.read.parquet(f)
            .agg(count(lit(1)), min("y"), max("y")).collect()(0)
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        val scanned = stats.collect {
          case (n, lo, hi) if probe >= lo && probe <= hi => n
        }.sum
        scanned.toDouble / stats.map(_._1).sum
      }
      val qFrac = probeScanFrac(s"$dir/qz", 2000000L)
      val mFrac = probeScanFrac(s"$dir/mm", 2000000L)
      assert(qFrac < mFrac / 2,
        s"quantile file scan $qFrac must beat min-max $mFrac")
      assert(qFrac <= 0.3, s"quantile file scan $qFrac should be ≤ 0.3")
      // layout changes bytes on disk, never rows: content identical
      assert(spark.read.parquet(s"$dir/qz").orderBy("x", "y").collect().toSeq
        === skewed.orderBy("x", "y").collect().toSeq)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("withZValueQuantile: pinned cuts bucket new data identically") {
    val cuts = Layout.quantileCuts(skewed, Seq("x", "y"))
    val fromCuts = Layout.withZValueQuantile(
      skewed, Seq("x", "y"), cuts = cuts)
    val fresh = Layout.withZValueQuantile(skewed, Seq("x", "y"))
    assert(fromCuts.orderBy("x", "y").select("zval").collect().toSeq ===
      fresh.orderBy("x", "y").select("zval").collect().toSeq)
  }

  test("census: empty probes refuse loudly") {
    intercept[IllegalArgumentException] {
      Layout.zorderSkippingCensus(grid, Seq("x", "y"), Map.empty)
    }
  }
}
