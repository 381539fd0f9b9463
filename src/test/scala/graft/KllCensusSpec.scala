package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.KllSketch._
import graft.operators.Census
import graft.sinks.Sink
import graft.streaming.StreamCensus

/** KLL quantile-census lifecycle: exact n through any merge tree,
  * quantile estimates within the published rank-error bound, KS drift
  * vs the exact statistic, and the persisted lifecycle's guard-only
  * exactly-once contract (counting algebra has no idempotence
  * backstop — demonstrated both ways).
  */
class KllCensusSpec extends SparkSpec {
  import spark.implicits._

  // heavy-tailed synthetic lattice: i² over 0..9999 (median/max = 0.25)
  private def skewed: DataFrame =
    spark.range(10000)
      .select((col("id") % 5).as("g"), (col("id") * col("id")).as("v"))

  /** Exact rank (ppm) of `value` in `df.v`, per the INCLUSIVE (≤)
    * convention the sketch uses.
    */
  private def exactRankPpm(df: DataFrame, value: Long): Long = {
    val (le, n) = df.agg(
      sum(when(col("v") <= value, 1L).otherwise(0L)),
      count(lit(1))).as[(Long, Long)].head()
    le * 1000000L / n
  }

  test("empty-sketch scalars are DECLARED nullable and propagate null " +
      "(all-null group through a non-nullable sketch column)") {
    // KllSketchAgg's sketch column is non-nullable; a group whose values
    // are all null yields an EMPTY sketch, and the scalar expressions
    // return null from it — without nullable=true on the expressions the
    // optimizer may mis-prune / codegen read garbage instead
    val df = spark.range(4)
      .select((col("id") % 2).as("g"),
        when(col("id") % 2 === 0, col("id")).as("v"))
      .groupBy(col("g")).agg(kll_sketch(col("v")).as("sk"))
      .select(col("g"),
        kll_quantile(col("sk"), lit(500000L)).as("q"),
        kll_rank(col("sk"), lit(1L)).as("r"),
        kll_ks(col("sk"), col("sk")).as("ks"))
    assert(df.schema("q").nullable && df.schema("r").nullable &&
      df.schema("ks").nullable)
    val rows = df.orderBy(col("g")).collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2) &&
      !rows(0).isNullAt(3))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3),
      "all-null group must surface null, not garbage")
    // and IsNotNull on the scalar must not be constant-folded away
    assert(df.filter(col("q").isNotNull).count() === 1)
  }

  test("n is exact through delta merges; quantile estimates stay " +
      "within the rank-error bound on a heavy-tailed lattice") {
    val df = skewed
    def delta(p: Int) = Census.quantileSketchTable(
      df.filter(pmod(col("g"), lit(2)) === p), "v", Seq("g"), k = 200)
    val census = Census.mergeQuantileCensus(
      delta(0), delta(1), Seq("g"), k = 200)
    // roll the 5 per-g sketches to one global and ask 4 percentiles
    val ranks = Seq(100000L, 500000L, 900000L, 990000L)
    val report = Census.quantilesFromCensus(census, Seq.empty, ranks, k = 200)
      .select(col("rank_ppm"), col("n"), col("quantile_est"))
      .as[(Long, Long, Long)].collect()
    assert(report.length === 4)
    report.foreach { case (_, n, _) => assert(n === 10000L) }
    // k=200 ⇒ ~1.65% rank error (99% conf); assert a 4% ceiling
    report.foreach { case (rank, _, est) =>
      val exact = exactRankPpm(df, est)
      assert(math.abs(exact - rank) <= 40000L,
        s"rank $rank: est $est has exact rank $exact")
    }
  }

  test("merge order does not change n, and min/max survive exactly") {
    val df = skewed
    val oneShot = df.agg(kll_sketch(col("v"), 200).as("s"))
    val viaDeltas = Census.mergeQuantileCensus(
      Census.quantileSketchTable(df.filter(col("v") % 3 === 0), "v", Seq("g")),
      Census.mergeQuantileCensus(
        Census.quantileSketchTable(df.filter(col("v") % 3 === 1), "v", Seq("g")),
        Census.quantileSketchTable(df.filter(col("v") % 3 === 2), "v", Seq("g")),
        Seq("g")),
      Seq("g"))
    val nA = oneShot.select(kll_n(col("s"))).as[Long].head()
    val nB = viaDeltas.agg(kll_merge_agg(col("sketch")).as("s"))
      .select(kll_n(col("s"))).as[Long].head()
    assert(nA === 10000L && nB === 10000L)
    // rank endpoints: the true min and max are always retained
    val loHi = viaDeltas.agg(kll_merge_agg(col("sketch")).as("s"))
      .select(kll_quantile(col("s"), lit(0L)),
        kll_quantile(col("s"), lit(1000000L)))
      .as[(Long, Long)].head()
    assert(loHi === ((0L, 9999L * 9999L)))
  }

  test("KS from sketches tracks the exact statistic: ~0 for the same " +
      "distribution, large for a shifted one, both within budget") {
    // both sides ~uniform on [0, 100000): a wrapping odd multiplier
    // makes two disjoint index windows sample the same distribution
    val a = spark.range(8000).select((col("id") * 7919 % 100000).as("v"))
    val same = spark.range(8000)
      .select(((col("id") + 8000) * 7919 % 100000).as("v"))
    val shifted = a.select((col("v") * 2 + 50000).as("v"))
    def sk(df: DataFrame) = Census.quantileSketchTable(
      df.withColumn("g", lit(1)), "v", Seq("g"), k = 200)

    def ksPair(x: DataFrame, y: DataFrame): (Long, Long) = {
      val est = Census.distributionDrift(sk(x), sk(y), k = 200)
        .select(col("ks_ppm")).as[Long].head()
      val exact = Census.exactKs(x, y, "v")
        .select(col("ks_exact_ppm")).as[Long].head()
      (est, exact)
    }
    val (estSame, exactSame) = ksPair(a, same)
    val (estShift, exactShift) = ksPair(a, shifted)
    // error budget: 2 × 1.65% sketch rank error + 2/256 grid ≈ 4.1%
    assert(math.abs(estSame - exactSame) <= 45000L,
      s"same-pair KS est $estSame vs exact $exactSame")
    assert(math.abs(estShift - exactShift) <= 45000L,
      s"shifted-pair KS est $estShift vs exact $exactShift")
    assert(estSame < 100000L, s"same distribution flagged: $estSame")
    assert(estShift > 300000L, s"shifted distribution missed: $estShift")
  }

  test("persisted lifecycle: the batchId guard alone carries " +
      "exactly-once — replay skipped; an ungated double-merge " +
      "provably double-counts") {
    val table = Files.createTempDirectory("kll_census_tbl").toString
    val df = skewed
    val delta = Census.quantileSketchTable(df, "v", Seq("g"), k = 200)
    try {
      assert(Sink.mergeKllCensusTable(spark, table, delta, Seq("g"), 0L))
      def totalN: Long = Sink.readCensusTable(spark, table).get._1
        .agg(kll_merge_agg(col("sketch")).as("s"))
        .select(kll_n(col("s"))).as[Long].head()
      assert(totalN === 10000L)

      // guard path: redelivered batchId 0 is skipped entirely
      assert(!Sink.mergeKllCensusTable(spark, table, delta, Seq("g"), 0L))
      assert(totalN === 10000L)

      // NO algebraic backstop: the same delta forced through with a
      // fresh batchId double-counts — which is exactly why the guard
      // is load-bearing for the counting sketches (HLL/theta would
      // absorb this; KLL must not be allowed to see it)
      assert(Sink.mergeKllCensusTable(spark, table, delta, Seq("g"), 1L))
      assert(totalN === 20000L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
    }
  }

  test("streaming twin: kill/recover keeps n exact and percentiles " +
      "within bound; single live generation on disk") {
    val input = Files.createTempDirectory("kll_in")
    val checkpoint = Files.createTempDirectory("kll_ckpt")
    val table = Files.createTempDirectory("kll_tbl").toString
    val schema = StructType(Seq(StructField("v", LongType)))

    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = input.resolve(s".$name.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, input.resolve(name))
    }
    def run(): Unit = {
      val stream = spark.readStream.schema(schema).json(input.toString)
        .withColumn("g", lit(1))
      val q = StreamCensus.kllCensusWriter(stream, "v", Seq("g"), table)
        .option("checkpointLocation", checkpoint.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    val epoch1 = (0L until 5000L).map(i => i * i)
    val epoch2 = (5000L until 10000L).map(i => i * i)
    try {
      writeBatch("b1.json", epoch1.map(v => s"""{"v":$v}"""))
      run() // epoch 1, then the driver "dies"
      writeBatch("b2.json", epoch2.map(v => s"""{"v":$v}"""))
      run() // restart from the same checkpoint

      val (census, _) = Sink.readCensusTable(spark, table).get
      val merged = census.agg(kll_merge_agg(col("sketch")).as("s"))
      assert(merged.select(kll_n(col("s"))).as[Long].head() === 10000L)
      val p50 = merged
        .select(kll_quantile(col("s"), lit(500000L))).as[Long].head()
      val all = (epoch1 ++ epoch2).toDF("v")
      assert(math.abs(exactRankPpm(all, p50) - 500000L) <= 40000L)
      assert(new java.io.File(table).listFiles()
        .count(_.getName.startsWith("gen-")) === 1)

      // REPLAY of a COMMITTED batch: foreachBatch redelivers batchId 0
      // after a crash; the KLL counting algebra has NO idempotence
      // backstop (an applied replay inflates n by 5000), so the guard
      // alone must skip it and the census must come back IDENTICAL —
      // n exact, median unchanged
      val delta1 = Census.quantileSketchTable(
        epoch1.toDF("v").withColumn("g", lit(1)), "v", Seq("g"))
      assert(!Sink.mergeKllCensusTable(spark, table, delta1, Seq("g"),
        batchId = 0L))
      val (census2, _) = Sink.readCensusTable(spark, table).get
      val merged2 = census2.agg(kll_merge_agg(col("sketch")).as("s"))
      assert(merged2.select(kll_n(col("s"))).as[Long].head() === 10000L,
        "replayed committed batch must not double-count")
      assert(merged2
        .select(kll_quantile(col("s"), lit(500000L))).as[Long].head()
        === p50, "census must be identical after a skipped replay")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
      org.apache.commons.io.FileUtils.deleteDirectory(input.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(checkpoint.toFile)
    }
  }
}
