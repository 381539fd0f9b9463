package graft

import java.nio.file.{Files, Path}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamBuildReport

/** Kill/resume for the STREAMING build census
  * ([[StreamBuildReport.censusWriter]]): per-epoch stage counts must
  * (a) reflect the composed pipeline's funnel semantics inside each
  * epoch, (b) stay idempotent under epoch replay (batchId-keyed sink),
  * and (c) stay CONTINUOUS across a kill + checkpoint restart — the
  * totals over the whole history count every document exactly once, and
  * a near-dup of a pre-kill admitted doc is still suppressed post-kill
  * (bucket state survived).
  */
class StreamBuildCensusSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1767225600000L // 2026-01-01 00:00:00 UTC, ms

  private val body =
    "the quick brown fox jumps over the lazy dog and then walks back " +
      "home across the quiet meadow while the morning light settles over " +
      "the hills and the river keeps moving slowly toward the distant sea"
  private val nearDup = body.replace("dog", "cat")
  private val ships =
    "completely different content about ships and harbors and the " +
      "long voyage north through ice and wind toward a quiet port " +
      "where sailors rest and tell their stories all winter long"

  private def writeLines(dir: Path, name: String, rows: Seq[String]): Unit = {
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, String.join("\n", rows: _*).getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(name))
  }

  private def row(id: Long, tsMs: Long, lang: String, text: String): String = {
    val esc = text.replace("\"", "\\\"")
    s"""{"doc_id":$id,"ts_ms":$tsMs,"lang":"$lang","text":"$esc"}"""
  }

  private def docStream(dir: Path): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts_ms", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    spark.readStream.schema(schema).json(dir.toString)
      .select(col("doc_id"), timestamp_millis(col("ts_ms")).as("ts"),
        col("lang"), col("text"))
  }

  test("census continuity across kill + restart; per-epoch funnel exact") {
    val input = Files.createTempDirectory("census-in")
    val checkpoint = Files.createTempDirectory("census-ckpt")
    val reference =
      Seq((900L, s"BENCHMARK $body BENCHMARK")).toDF("doc_id", "text")
    // batchId -> census / admitted doc ids: replayed epochs overwrite
    // their own slot (the idempotency contract under test)
    val census = TrieMap.empty[Long, Seq[(String, Long)]]
    val admitted = TrieMap.empty[Long, Seq[Long]]

    def run(): Unit = {
      val q = StreamBuildReport.censusWriter(
        docStream(input), reference,
        minQuality = 0.4, carryCols = Seq("lang"),
        delayMinutes = 60) { (batchId, c, docs) =>
        census.put(batchId, c)
        admitted.put(batchId,
          docs.select(col("doc_id")).as[Long].collect().toSeq)
        ()
      }
        .option("checkpointLocation", checkpoint.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // epoch 1: one good English doc, one benchmark copy (decontam
    // reject — passes quality), one junk doc (quality reject)
    writeLines(input, "batch1.json", Seq(
      row(1, t0, "en", body),
      row(3, t0, "en", s"BENCHMARK $body BENCHMARK"),
      row(4, t0, "en", "zzzz9 qqqq7 xxxx3")))
    run() // then the driver "dies"

    val e1 = census.toMap.filter(_._2.exists(_._2 > 0L))
    assert(e1.size === 1, s"one non-empty epoch expected: $census")
    val (e1Id, e1Census) = e1.head
    assert(e1Census.toMap === Map(
      "input" -> 3L, "quality" -> 2L, "decontam" -> 1L, "admitted" -> 1L),
      s"epoch-1 funnel: $e1Census")
    assert(admitted(e1Id) === Seq(1L))

    // epoch 2, NEW query instance from the same checkpoint: a near-dup
    // of epoch-1's admitted doc (must be suppressed — state survived the
    // kill) plus a genuinely new doc (admitted)
    writeLines(input, "batch2.json", Seq(
      row(10, t0 + 60000, "en", nearDup),
      row(11, t0 + 60000, "en", ships)))
    run()

    val e2 = census.toMap.filter { case (id, c) =>
      id != e1Id && c.exists(_._2 > 0L)
    }
    assert(e2.size === 1, s"one new non-empty epoch expected: $census")
    val (e2Id, e2Census) = e2.head
    assert(e2Census.toMap === Map(
      "input" -> 2L, "quality" -> 2L, "decontam" -> 2L, "admitted" -> 1L),
      s"epoch-2 funnel (near-dup must be suppressed): $e2Census")
    assert(admitted(e2Id) === Seq(11L))

    // continuity: totals over the whole kill/replay history count every
    // document exactly once (batchId-keyed last-write-wins)
    val totals = census.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(totals("input") === 5L)
    assert(totals("quality") === 4L)
    assert(totals("decontam") === 3L)
    assert(totals("admitted") === 2L)
  }

  test("batch twin agreement: one epoch census equals the batch stage counts") {
    val input = Files.createTempDirectory("census-in2")
    val checkpoint = Files.createTempDirectory("census-ckpt2")
    val reference = Seq((900L, ships)).toDF("doc_id", "text")
    val census = TrieMap.empty[Long, Seq[(String, Long)]]

    val docs = Seq(
      (1L, "en", body),
      (2L, "en", ships), // decontam reject
      (3L, "en", "qqq1 zzz2"), // quality reject
      (4L, "en", nearDup), // near-dup of doc 1 (later ts -> suppressed)
      (5L, "en", body.replaceAll("fox", "wolf") + " extra tokens here"))
    writeLines(input, "b.json",
      docs.zipWithIndex.map { case ((id, l, t), i) =>
        row(id, t0 + i * 1000, l, t)
      })
    val q = StreamBuildReport.censusWriter(
      docStream(input), reference,
      minQuality = 0.4, carryCols = Seq("lang"),
      delayMinutes = 60) { (batchId, c, _) =>
      census.put(batchId, c); ()
    }
      .option("checkpointLocation", checkpoint.toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    // batch-side stage counts over the same 5 docs
    val df = docs.map { case (id, l, t) => (id, l, t) }
      .toDF("doc_id", "lang", "text")
    val q1 = graft.operators.TextAnalysis.withQuality(df)
      .filter(col("quality_score") >= 0.4)
    val nQuality = q1.count()
    val key = md5(graft.operators.Dedup.normText(col("text")))
    val refK = reference.select(key.as("k")).distinct()
    val clean = q1.withColumn("k", key)
      .join(refK, Seq("k"), "left_anti")
    val nClean = clean.count()
    val got = census.values.find(_.exists(_._2 > 0L)).get.toMap
    assert(got("input") === 5L)
    assert(got("quality") === nQuality)
    assert(got("decontam") === nClean)
    // near-dup suppression: doc 4 within hamming<=3 of doc 1 -> one drop
    assert(got("admitted") === nClean - 1L)
  }
}
