package graft

import java.nio.file.{Files, Path}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.StreamCuration

/** Kill/resume for the COMPOSED streaming curation pipeline
  * (quality filter → decontam → near-dup suppression → routed sink):
  *
  *   - a benchmark document is rejected in epoch 1 (decontam);
  *   - a low-quality document is rejected in epoch 1 (quality gate);
  *   - the query is then killed; epoch 2 runs a NEW query instance from
  *     the same checkpoint and feeds a NEAR-DUPLICATE of an epoch-1
  *     admitted doc — the bucket state must have survived the restart for
  *     it to be suppressed;
  *   - admitted docs land in their first-match route exactly once across
  *     the whole kill/replay history (batchId-idempotent sink).
  */
class StreamCurationRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1767225600000L // 2026-01-01 00:00:00 UTC, ms

  // long, wordy, high-quality bodies; `nearDup` is a one-word change of
  // `body` (measured simhash hamming 2 — premise-asserted in the test);
  // `german`/`ships` are far (hamming 26)
  private val body =
    "the quick brown fox jumps over the lazy dog and then walks back " +
      "home across the quiet meadow while the morning light settles over " +
      "the hills and the river keeps moving slowly toward the distant sea"
  private val nearDup = body.replace("dog", "cat")
  private val german =
    "der schnelle braune fuchs springt nicht sondern wandert " +
      "durch den stillen wald waehrend der morgen ueber den bergen " +
      "aufgeht und der fluss langsam zum fernen meer fliesst immer weiter"
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

  test("composed curation survives kill + restart; state and routing hold") {
    val input = Files.createTempDirectory("cur-in")
    val checkpoint = Files.createTempDirectory("cur-ckpt")
    val reference = Seq((900L, s"BENCHMARK $body BENCHMARK")).toDF("doc_id", "text")
    // (table, batchId) -> rows: replayed epochs overwrite their own slot
    val emitted = TrieMap.empty[(String, Long), Seq[(Long, String)]]

    def run(): Unit = {
      val q = StreamCuration.routedWriter(
        docStream(input), reference,
        routes = Seq("english_docs" -> (col("lang") === "en"),
          "other_docs" -> (col("lang") =!= "xx")),
        defaultTable = "iot_raw",
        // 0.4, not 0.5: the stopword term of quality_score is English-
        // centric, so the genuine German doc scores 0.416 (29 tokens,
        // no punctuation, zero English stopwords); junk stays ~0.3
        minQuality = 0.4, carryCols = Seq("lang"),
        delayMinutes = 60) { (table, batchId, df) =>
        emitted.put((table, batchId),
          df.select(col("doc_id"), col("lang"))
            .as[(Long, String)].collect().toSeq)
        ()
      }
        .option("checkpointLocation", checkpoint.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    // premise: the near-dup really is within the banding guarantee and
    // the distinct texts really are far apart
    def sig(t: String): Long = Seq(t).toDF("text")
      .select(graft.operators.Dedup.simhash(col("text"))).as[Long].head()
    val h = java.lang.Long.bitCount(sig(body) ^ sig(nearDup))
    assert(h > 0 && h <= 3, s"premise: nearDup must be a near-dup, hamming=$h")
    assert(java.lang.Long.bitCount(sig(body) ^ sig(german)) > 3)
    assert(java.lang.Long.bitCount(sig(body) ^ sig(ships)) > 3)

    // epoch 1: one good English doc, one good German doc, one benchmark
    // copy (decontam reject), one junk doc (quality reject)
    writeLines(input, "batch1.json", Seq(
      row(1, t0, "en", body),
      row(2, t0, "de", german),
      row(3, t0, "en", s"BENCHMARK $body BENCHMARK"),
      row(4, t0, "en", "zzzz9 qqqq7 xxxx3")))
    run() // then the driver "dies"

    val afterE1 = emitted.toMap
    val e1Admitted = afterE1.values.flatten.map(_._1).toSet
    assert(e1Admitted === Set(1L, 2L),
      s"epoch 1 must admit exactly docs 1 and 2: $afterE1")
    assert(afterE1.collect { case ((t, _), rs) if rs.nonEmpty => t -> rs }
      .forall { case (t, rs) => rs.forall {
        case (_, "en") => t == "english_docs"
        case _         => t == "other_docs"
      } }, s"first-match routing by lang: $afterE1")

    // epoch 2, NEW query from the same checkpoint: a near-duplicate of
    // doc 1 (same body, tiny suffix tweak) plus a fresh unique doc. The
    // near-dup is only suppressed if bucket state survived the restart.
    writeLines(input, "batch2.json", Seq(
      row(5, t0 + 60 * 1000, "en", nearDup),
      row(6, t0 + 60 * 1000, "en", ships)))
    run()

    val all = emitted.toMap.values.flatten.toSeq
    val admittedIds = all.map(_._1)
    assert(!admittedIds.contains(5L),
      s"near-dup of a pre-kill doc must stay suppressed after recovery: $all")
    assert(admittedIds.contains(6L), s"fresh unique doc must be admitted: $all")
    assert(admittedIds.groupBy(identity).forall(_._2.size == 1),
      s"exactly-once emission across kill/replay: $admittedIds")
  }
}
