package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis
import graft.sinks.Sink
import graft.streaming.StreamTextIngest

/** The incremental half of the text-index lifecycle driven from a real
  * stream: documents streamed into a persisted inverted index become
  * immediately searchable, exactly once across kill/replay AND across
  * the gated compaction a restart may straddle.
  *
  *   - build + persist the index on a base slice of the corpus;
  *   - epoch 1 streams in one doc batch, then the driver "dies";
  *     epoch 2 restarts from the checkpoint with tight compaction
  *     thresholds, ingests more, and the writer's own gated
  *     maintenance folds everything into a committed generation;
  *   - a deliberate REPLAY of epoch 1's batch AFTER the compaction
  *     must be absorbed by the folded-batch ledger (its docs already
  *     live in base postings);
  *   - the final incremental state scores identically to a batch
  *     rebuild over the union (BM25 and phrase), which is the whole
  *     point of the exactly-once machinery.
  */
class StreamTextIngestSpec extends SparkSpec {
  import spark.implicits._

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def writeDocFile(
      dir: Path, name: String, rows: Seq[(Long, String)]): Unit = {
    val lines = rows.map { case (id, text) =>
      s"""{"doc_id":$id,"text":${jsonStr(text)}}"""
    }
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, String.join("\n", lines: _*).getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(name))
  }

  private def docStream(dir: Path): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    spark.readStream.schema(schema).json(dir.toString)
  }

  test("streamed text ingest: exactly-once across kill/replay and " +
      "across gated compaction, parity with a batch rebuild") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") < 200)
    val rest = docs.filter(col("doc_id") >= 200 && col("doc_id") < 220)
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val (batch1, batch2) = rest.splitAt(10)
    val idxDir = Files.createTempDirectory("text_ingest_idx").toString
    val fullDir = Files.createTempDirectory("text_ingest_full").toString
    val input = Files.createTempDirectory("text_ingest_in")
    val checkpoint = Files.createTempDirectory("text_ingest_ckpt")
    try {
      Sink.writeTextIndex(base, idxDir, buckets = 16)
      val nBase = Sink.readTextIndex(spark, idxDir).nDocs

      def run(maxBatches: Long): Unit = {
        val q = StreamTextIngest.ingestWriter(docStream(input), idxDir,
          maxIngestedFiles = Long.MaxValue, maxBatches = maxBatches)
          .option("checkpointLocation", checkpoint.toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }

      writeDocFile(input, "batch1.json", batch1)
      run(maxBatches = Long.MaxValue) // epoch 1, then the driver "dies"
      assert(Sink.readTextIndex(spark, idxDir).nDocs === nBase + 10)
      assert(new java.io.File(s"$idxDir/postings_ingested").exists(),
        "thresholds disabled: epoch 1 must leave the ingested layout")

      // in-flight replay (the StreamAnnIngestSpec shape): re-land epoch
      // 1's rows as batch 0 directly — the dynamic overwrite must land
      // them on top of themselves, not duplicate
      Sink.appendTextIndex(spark, idxDir,
        batch1.toDF("doc_id", "text"), batchId = 0L)
      assert(Sink.readTextIndex(spark, idxDir).nDocs === nBase + 10,
        "replayed in-flight batch must overwrite its own partitions")

      // epoch 2 from the same checkpoint, tight threshold: the writer's
      // own gated maintenance must fold everything it has ingested
      writeDocFile(input, "batch2.json", batch2)
      run(maxBatches = 0L)
      assert(Sink.resolveIndexRoot(spark, idxDir) === s"$idxDir/gen-1",
        "gated compaction must have committed a generation")
      assert(!new java.io.File(s"$idxDir/postings_ingested").exists())
      assert(Sink.readTextIndex(spark, idxDir).nDocs === nBase + 20)

      // replay ACROSS the compaction boundary: a restart from a stale
      // checkpoint redelivers batch 0 — the folded ledger must skip it
      Sink.appendTextIndex(spark, idxDir,
        batch1.toDF("doc_id", "text"), batchId = 0L)
      assert(Sink.readTextIndex(spark, idxDir).nDocs === nBase + 20,
        "a batch folded into base postings must not re-enter on replay")

      // the incremental lifecycle's whole contract: state ≡ one batch
      // build over the union, for BM25 AND the positional phrase path
      Sink.writeTextIndex(docs.filter(col("doc_id") < 220), fullDir,
        buckets = 16)
      val incIdx = Sink.readTextIndex(spark, idxDir)
      val fullIdx = Sink.readTextIndex(spark, fullDir)
      assert((incIdx.nDocs, incIdx.totalTokens) ===
        ((fullIdx.nDocs, fullIdx.totalTokens)))
      val terms = Seq("vector", "hash", "merge")
      assert(TextAnalysis.bm25TopK(incIdx, terms, k = 20)
          .as[(Long, Long)].collect().toSeq ===
        TextAnalysis.bm25TopK(fullIdx, terms, k = 20)
          .as[(Long, Long)].collect().toSeq)
      assert(TextAnalysis.phraseTopK(incIdx, Seq("table", "hash"), k = 20)
          .as[(Long, Long)].collect().toSeq ===
        TextAnalysis.phraseTopK(fullIdx, Seq("table", "hash"), k = 20)
          .as[(Long, Long)].collect().toSeq)

      // and the valve is a no-op below threshold: nothing to fold, the
      // committed generation stays where it is
      assert(Sink.compactTextIndexIfNeeded(spark, idxDir) ===
        ((false, 0L, 0L)))
      assert(Sink.resolveIndexRoot(spark, idxDir) === s"$idxDir/gen-1")
    } finally {
      Seq(idxDir, fullDir).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
      org.apache.commons.io.FileUtils.deleteDirectory(input.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(checkpoint.toFile)
    }
  }

  test("compactTextIndexIfNeeded: below both thresholds is a pure " +
      "census no-op; above either, one committed generation with " +
      "query parity") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 120)
    val dir = Files.createTempDirectory("text_gate").toString
    try {
      Sink.writeTextIndex(docs.filter(col("doc_id") < 100), dir,
        buckets = 8)
      Sink.appendTextIndex(spark, dir,
        docs.filter(col("doc_id") >= 100), batchId = 0L)
      val terms = Seq("vector", "hash")
      val pre = TextAnalysis.bm25TopK(
        Sink.readTextIndex(spark, dir), terms, k = 10)
        .as[(Long, Long)].collect().toSeq
      // generous thresholds: no-op, but the census still reports load
      val (did, nFiles, nBatches) =
        Sink.compactTextIndexIfNeeded(spark, dir,
          maxIngestedFiles = 1000L, maxBatches = 16L)
      assert(!did && nFiles > 0L && nBatches === 1L)
      assert(Sink.resolveIndexRoot(spark, dir) === dir,
        "below threshold: no generation may appear")
      // one file over the line: fires, one committed generation, parity
      val (did2, _, _) = Sink.compactTextIndexIfNeeded(spark, dir,
        maxIngestedFiles = 0L, maxBatches = 16L)
      assert(did2)
      assert(Sink.resolveIndexRoot(spark, dir) === s"$dir/gen-1")
      assert(TextAnalysis.bm25TopK(
          Sink.readTextIndex(spark, dir), terms, k = 10)
        .as[(Long, Long)].collect().toSeq === pre,
        "gated compaction must not change any query result")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
