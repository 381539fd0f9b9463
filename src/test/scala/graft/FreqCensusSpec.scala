package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FreqItemsSketch._
import graft.operators.{Census, TextAnalysis}
import graft.sinks.Sink
import graft.streaming.StreamCensus

/** Persisted frequent-items census (DataSketches ItemsSketch — the
  * SERIALIZED, re-mergeable sibling of the in-plan Misra–Gries
  * aggregate): exact mode is order-independent and hash-stable,
  * estimation mode keeps the published no-false-negative + bracket
  * guarantees, and the lifecycle's exactly-once rests on the batchId
  * guard alone (counting algebra).
  */
class FreqCensusSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(df: DataFrame): Map[String, Long] =
    df.groupBy("item").count().as[(String, Long)].collect().toMap

  test("exact mode: census-merged counts equal the exact GROUP BY for " +
      "any delta split, max_error 0, threshold semantics exact") {
    val toks = TextAnalysis.tokens(Tables.documents(spark, sf))
      .select(col("doc_id"), col("token").as("item"))
    val exact = exactCounts(toks)
    def delta(p: Int) = Census.freqSketchTable(
      toks.filter(pmod(col("doc_id"), lit(3)) === p),
      "item", Seq(), maxMapSize = 1024)
    val census = Census.mergeFreqCensus(
      Census.mergeFreqCensus(delta(0), delta(1), Seq(), 1024),
      delta(2), Seq(), 1024)
    val report = Census.heavyHittersFromCensus(census, Seq(), 1L, 1024)
      .select(col("item"), col("freq"), col("freq_lb"), col("freq_ub"),
        col("stream_len"), col("max_error"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(report.nonEmpty)
    val n = exact.values.sum
    report.foreach { case (item, freq, lb, ub, len, err) =>
      assert(err === 0L, "vocab fits the map: must be exact mode")
      assert(len === n)
      assert(freq === exact(item), s"$item: $freq vs ${exact(item)}")
      assert(lb === freq && ub === freq)
    }
    assert(report.map(_._1).toSet === exact.keySet)
    // a real threshold keeps exactly the true heavy set
    val t = exact.values.toSeq.sorted.apply(exact.size / 2)
    val cut = Census.heavyHittersFromCensus(census, Seq(), t, 1024)
      .select(col("item")).as[String].collect().toSet
    assert(cut === exact.filter(_._2 >= t).keySet)
  }

  test("estimation mode: brackets contain the truth and nothing above " +
      "maxError is missed (no false negatives)") {
    // one dominant item + a long tail, far over a maxMapSize-8 map
    val rows = (0 until 4000).map(i => s"tail_${i % 997}") ++
      Seq.fill(1500)("whale") ++ Seq.fill(700)("shark")
    val df = rows.toDF("item")
      .withColumn("part", monotonically_increasing_id() % 7)
    val exact = exactCounts(df)
    def delta(p: Int) = Census.freqSketchTable(
      df.filter(col("part") === p), "item", Seq(), maxMapSize = 8)
    val census = (1 until 7).foldLeft(delta(0)) { (acc, p) =>
      Census.mergeFreqCensus(acc, delta(p), Seq(), 8)
    }
    val report = Census.heavyHittersFromCensus(census, Seq(), 1L, 8)
      .select(col("item"), col("freq"), col("freq_lb"), col("freq_ub"),
        col("stream_len"), col("max_error"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val maxError = report.head._6
    assert(maxError > 0L, "tiny map over a wide vocab must have purged")
    assert(report.head._5 === rows.size.toLong, "stream length is exact")
    report.foreach { case (item, _, lb, ub, _, _) =>
      val truth = exact(item)
      assert(lb <= truth && truth <= ub,
        s"$item: truth $truth outside [$lb, $ub]")
    }
    // the published guarantee: any item with truth > maxError is kept
    val reported = report.map(_._1).toSet
    exact.filter(_._2 > maxError).keys.foreach { item =>
      assert(reported.contains(item),
        s"$item (count ${exact(item)} > maxError $maxError) was dropped")
    }
    assert(reported.contains("whale") && reported.contains("shark"))
  }

  test("persisted lifecycle: guard skips a replayed batchId; an " +
      "ungated double-merge provably double-counts") {
    val table = Files.createTempDirectory("freq_census_tbl").toString
    val items = (Seq.fill(300)("a") ++ Seq.fill(100)("b")).toDF("item")
    val delta = Census.freqSketchTable(items, "item", Seq(), 64)
    try {
      def lenAndA: (Long, Long) = {
        val census = Sink.readCensusTable(spark, table).get._1
        Census.heavyHittersFromCensus(census, Seq(), 1L, 64)
          .filter(col("item") === "a")
          .select(col("stream_len"), col("freq"))
          .as[(Long, Long)].head()
      }
      assert(Sink.mergeFreqCensusTable(spark, table, delta, Seq(), 0L, 64))
      assert(lenAndA === ((400L, 300L)))
      assert(!Sink.mergeFreqCensusTable(spark, table, delta, Seq(), 0L, 64))
      assert(lenAndA === ((400L, 300L)), "replayed epoch must be skipped")
      assert(Sink.mergeFreqCensusTable(spark, table, delta, Seq(), 1L, 64))
      assert(lenAndA === ((800L, 600L)),
        "counting algebra double-counts without the guard")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
    }
  }

  test("streaming twin: kill/recover matches a batch census exactly " +
      "in exact mode") {
    val input = Files.createTempDirectory("freq_in")
    val checkpoint = Files.createTempDirectory("freq_ckpt")
    val table = Files.createTempDirectory("freq_tbl").toString

    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = input.resolve(s".$name.tmp")
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, input.resolve(name))
    }
    def run(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType)))
      val stream = spark.readStream.schema(schema).json(input.toString)
      val q = StreamCensus.freqCensusWriter(stream, "item", Seq(), table, 64)
        .option("checkpointLocation", checkpoint.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    val e1 = Seq.fill(200)("x") ++ Seq.fill(50)("y")
    val e2 = Seq.fill(100)("x") ++ Seq.fill(150)("z")
    try {
      writeBatch("b1.json", e1.map(i => s"""{"item":"$i"}"""))
      run() // epoch 1, then the driver "dies"
      writeBatch("b2.json", e2.map(i => s"""{"item":"$i"}"""))
      run() // restart from the same checkpoint

      val census = Sink.readCensusTable(spark, table).get._1
      val got = Census.heavyHittersFromCensus(census, Seq(), 1L, 64)
        .select(col("item"), col("freq")).as[(String, Long)].collect().toMap
      assert(got === Map("x" -> 300L, "y" -> 50L, "z" -> 150L))
      // single live generation on disk, like the KLL/HLL twins
      assert(new java.io.File(table).listFiles()
        .count(_.getName.startsWith("gen-")) === 1)

      // REPLAY of a COMMITTED batch: foreachBatch redelivers batchId 0
      // after a crash; the Misra-Gries counting algebra double-counts on
      // an applied replay (x would read 400), so the guard alone must
      // skip it and the census must come back IDENTICAL
      val delta1 = Census.freqSketchTable(
        e1.toDF("item"), "item", Seq(), 64)
      assert(!Sink.mergeFreqCensusTable(spark, table, delta1, Seq(),
        batchId = 0L, maxMapSize = 64))
      val census2 = Sink.readCensusTable(spark, table).get._1
      val got2 = Census.heavyHittersFromCensus(census2, Seq(), 1L, 64)
        .select(col("item"), col("freq")).as[(String, Long)].collect().toMap
      assert(got2 === got,
        "census must be identical after a skipped replay")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
      org.apache.commons.io.FileUtils.deleteDirectory(input.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(checkpoint.toFile)
    }
  }
}
