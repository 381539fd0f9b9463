package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Census
import graft.sinks.Sink
import graft.streaming.StreamCensus

/** Streaming census lifecycle: per-group distinct sketches maintained
  * one micro-batch at a time must be BIT-IDENTICAL (same estimates) to
  * a batch census over all rows ever streamed, across a kill/restart,
  * and exactly-once under epoch replay — both via the batchId
  * transactional guard and, independently, via HLL's register-max
  * idempotence.
  */
class StreamCensusSpec extends SparkSpec {
  import spark.implicits._

  private def writeEventsFile(
      dir: Path, name: String, rows: Seq[(Long, String)]): Unit = {
    val lines = rows.map { case (uid, et) =>
      s"""{"user_id":$uid,"event_type":"$et"}"""
    }
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, String.join("\n", lines: _*).getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(name))
  }

  private def eventStream(dir: Path): DataFrame = {
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_type", StringType)))
    spark.readStream.schema(schema).json(dir.toString)
  }

  private def estimates(census: DataFrame): Map[String, Long] =
    Census.withEstimates(census)
      .select(col("event_type"), col("distinct_est"))
      .as[(String, Long)].collect().toMap

  test("streamed census == batch census across kill/recover; " +
      "replayed epochs exactly-once by guard AND by algebra") {
    // overlapping user sets per epoch: users [0,300) in epoch 1,
    // [150,450) in epoch 2 — the merge must not double-count the
    // 150-user overlap
    val epoch1 = (0L until 300L).map(u => (u, if (u % 2 == 0) "view" else "click")) ++
      (0L until 100L).map(u => (u, "view")) // intra-batch dups too
    val epoch2 = (150L until 450L).map(u => (u, if (u % 2 == 0) "view" else "click"))

    val input = Files.createTempDirectory("census_in")
    val checkpoint = Files.createTempDirectory("census_ckpt")
    val table = Files.createTempDirectory("census_tbl").toString

    def run(): Unit = {
      val q = StreamCensus.censusWriter(
          eventStream(input), "user_id", Seq("event_type"), table)
        .option("checkpointLocation", checkpoint.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    try {
      writeEventsFile(input, "batch1.json", epoch1)
      run() // epoch 1, then the driver "dies"

      val (census1, gen1) = Sink.readCensusTable(spark, table).get
      assert(gen1 === 0L)
      val afterE1 = estimates(census1)
      assert(afterE1 === estimates(Census.distinctSketch(
        epoch1.toDF("user_id", "event_type"), "user_id", Seq("event_type"))))

      writeEventsFile(input, "batch2.json", epoch2)
      run() // restart from the same checkpoint

      val (census2, gen2) = Sink.readCensusTable(spark, table).get
      assert(gen2 === 1L)
      // only the live generation remains on disk
      assert(new java.io.File(table).listFiles()
        .count(_.getName.startsWith("gen-")) === 1)

      // parity: streamed (two merged epochs) == batch over all rows —
      // exact estimate equality, not a tolerance (register-max merge)
      val all = (epoch1 ++ epoch2).toDF("user_id", "event_type")
      val want = estimates(Census.distinctSketch(all, "user_id", Seq("event_type")))
      val got = estimates(census2)
      assert(got === want, "streamed census diverged from batch census")
      // and the estimates are truthful at this cardinality
      val exact = all.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("ex"))
        .as[(String, Long)].collect().toMap
      exact.foreach { case (et, ex) =>
        assert(math.abs(got(et) - ex).toDouble / ex < 0.02,
          s"$et: est ${got(et)} vs exact $ex") }

      // global roll-up never rescans the stream: runs on the census rows
      val globalEst = Census.rollup(census2, Seq.empty)
        .as[Long].head()
      val globalExact = all.select(countDistinct(col("user_id"))).as[Long].head()
      assert(math.abs(globalEst - globalExact).toDouble / globalExact < 0.02)

      // REPLAY, guard path: foreachBatch redelivers epoch 1 (batchId 0)
      // after a crash — the committed generation is newer, so the merge
      // is skipped entirely
      val delta1 = Census.distinctSketch(
        epoch1.toDF("user_id", "event_type"), "user_id", Seq("event_type"))
      assert(!Sink.mergeCensusTable(spark, table, delta1,
        Seq("event_type"), batchId = 0L))
      assert(estimates(Sink.readCensusTable(spark, table).get._1) === want)

      // REPLAY, algebra path: even a delta that DOES merge twice (forced
      // through the guard with a fresh batchId) changes nothing —
      // HLL union is register-max idempotent
      assert(Sink.mergeCensusTable(spark, table, delta1,
        Seq("event_type"), batchId = 99L))
      val (census3, gen3) = Sink.readCensusTable(spark, table).get
      assert(gen3 === 99L)
      assert(estimates(census3) === want,
        "double-merged delta must be invisible in the census")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
      org.apache.commons.io.FileUtils.deleteDirectory(input.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(checkpoint.toFile)
    }
  }

  test("streamed THETA census: overlap from persisted sketches == exact " +
      "DISTINCT-join truth across kill/recover; replay exactly-once; " +
      "orphaned generations healed") {
    // purchase users [0,300), error users [200,500) → overlap 100;
    // each epoch carries half of both groups
    val epoch1 = (0L until 150L).map((_, "purchase")) ++
      (200L until 350L).map((_, "error"))
    val epoch2 = (150L until 300L).map((_, "purchase")) ++
      (350L until 500L).map((_, "error")) ++
      (0L until 50L).map((_, "purchase")) // cross-epoch dups too

    val input = Files.createTempDirectory("tcensus_in")
    val checkpoint = Files.createTempDirectory("tcensus_ckpt")
    val table = Files.createTempDirectory("tcensus_tbl").toString

    def run(): Unit = {
      val q = StreamCensus.thetaCensusWriter(
          eventStream(input), "user_id", Seq("event_type"), table)
        .option("checkpointLocation", checkpoint.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    def overlapRow(census: DataFrame): (Long, Long, Long, Long, Long) =
      Census.overlapFromCensus(
          census.filter(col("event_type") === "purchase"),
          census.filter(col("event_type") === "error"))
        .as[(Long, Long, Long, Long, Long)].head()

    try {
      writeEventsFile(input, "batch1.json", epoch1)
      run() // epoch 1, then the driver "dies"

      val (census1, gen1) = Sink.readCensusTable(spark, table).get
      assert(gen1 === 0L)
      assert(overlapRow(census1) === ((150L, 150L, 0L, 300L, 0L)))

      writeEventsFile(input, "batch2.json", epoch2)
      run() // restart from the same checkpoint

      val (census2, gen2) = Sink.readCensusTable(spark, table).get
      assert(gen2 === 1L)
      assert(new java.io.File(table).listFiles()
        .count(_.getName.startsWith("gen-")) === 1)
      // EXACT set algebra from the persisted census only: |A|=300,
      // |B|=300, |A∩B|=100, |A∪B|=500, jaccard 200000 ppm
      val want = (300L, 300L, 100L, 500L, 200000L)
      assert(overlapRow(census2) === want,
        "persisted theta census must answer the overlap exactly")

      // REPLAY, guard path: a redelivered epoch is skipped outright
      val delta1 = Census.thetaSketchTable(
        epoch1.toDF("user_id", "event_type"), "user_id", Seq("event_type"))
      assert(!Sink.mergeThetaCensusTable(spark, table, delta1,
        Seq("event_type"), batchId = 0L))
      // REPLAY, algebra path: a double-merged delta is set-invisible
      assert(Sink.mergeThetaCensusTable(spark, table, delta1,
        Seq("event_type"), batchId = 50L))
      assert(overlapRow(Sink.readCensusTable(spark, table).get._1) === want,
        "double-merged delta must be invisible in the theta census")

      // ORPHAN HEALING: simulate the crash window (new generation
      // committed, superseded one never deleted) by hand-restoring a
      // stale committed generation and a non-numeric stray; the next
      // merge must GC everything below its id and ignore the stray
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      spark.read.parquet(s"$table/gen-50").write.parquet(s"$table/gen-7")
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$table/gen-stray"))
      assert(Sink.mergeThetaCensusTable(spark, table,
        Census.thetaSketchTable(
          Seq((9999L, "purchase")).toDF("user_id", "event_type"),
          "user_id", Seq("event_type")),
        Seq("event_type"), batchId = 51L))
      val gens = new java.io.File(table).listFiles()
        .map(_.getName).filter(_.startsWith("gen-")).toSeq
      assert(gens.sorted === Seq("gen-51", "gen-stray"),
        s"older committed generations must be GC'd, saw $gens")
      val (census4, _) = Sink.readCensusTable(spark, table).get
      assert(overlapRow(census4) === ((301L, 300L, 100L, 501L, 199600L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
      org.apache.commons.io.FileUtils.deleteDirectory(input.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(checkpoint.toFile)
    }
  }
}
