package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}
import graft.sinks.Sink

/** The retention → index loop closed in one call ([[Sink.retentionSweep]]):
  * expiring raw date partitions tombstone every registered index root
  * under one batch-id lineage, THEN drop. Pins the equivalence
  * (swept state ≡ rebuild on retained docs, all three index families),
  * the replay guards (a re-run after the drop must not overwrite the
  * tombstone batch with the now-empty id set; a PARTIAL-drop re-run must
  * not overwrite it with the subset), and the lineage composition
  * (a re-crawl of a swept URL is an append at a later batch id —
  * batch-scoped tombstones do not mask it).
  */
class RetentionSweepSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rm(dirs: String*): Unit = dirs.foreach(d =>
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))

  private def bm25(path: String): Seq[(Long, Long)] =
    TextAnalysis.bm25TopK(Sink.readTextIndex(spark, path),
        Seq("vector", "hash", "merge"), k = 10)
      .as[(Long, Long)].collect().toSeq

  test("sweep: expiring partitions tombstone text + IVF + LSH under one " +
      "batch id, then drop; swept state ≡ rebuild on retained; post-drop " +
      "replay keeps the batch; a later append resurrects a swept id") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val raw = tmp("sweep_raw")
    val text = tmp("sweep_text")
    val ivf = tmp("sweep_ivf")
    val lsh = tmp("sweep_lsh")
    val refText = tmp("sweep_ref")
    try {
      docs.withColumn("date",
          concat(lit("2024-01-0"), (col("doc_id") % 5 + 1).cast("string")))
        .write.mode("overwrite").partitionBy("date").parquet(raw)
      Sink.writeTextIndex(docs, text, buckets = 8)
      val ivfIdx = Similarity.buildIvfIndexExact(emb, nlist = 4, iters = 1)
      Sink.writeIvfIndex(ivfIdx, ivf)
      ivfIdx.unpersist()
      val lshIdx = Similarity.buildLshIndex(emb, nBits = 32, bands = 8)
      Sink.writeLshIndex(lshIdx, lsh)
      lshIdx.unpersist()

      val dropped = Sink.retentionSweep(spark, raw, "2024-01-03",
        batchId = 0L, textIndexes = Seq(text), ivfIndexes = Seq(ivf),
        lshIndexes = Seq(lsh))
      assert(dropped === Seq("2024-01-01", "2024-01-02"))
      assert(!new java.io.File(s"$raw/date=2024-01-01").exists(),
        "raw partitions dropped after the tombstones landed")

      // text: swept logical state ≡ a fresh build over the retained docs
      Sink.writeTextIndex(docs.filter(col("doc_id") % 5 >= 2), refText,
        buckets = 8)
      assert(bm25(text) === bm25(refText), "sweep ≡ rebuild-on-retained")
      val sweptN = Sink.readTextIndex(spark, text).nDocs
      assert(sweptN === docs.filter(col("doc_id") % 5 >= 2).count())

      // vector families: no swept id serves from either layout
      val sweptIds = docs.filter(col("doc_id") % 5 < 2)
        .select(col("doc_id")).as[Long].collect().toSet
      val ivfIds = Sink.readIvfIndex(spark, ivf).celled
        .select(col("vec_id")).as[Long].collect().toSet
      assert(ivfIds.intersect(sweptIds).isEmpty, "IVF hides swept ids")
      val lshLoaded = Sink.readLshIndex(spark, lsh)
      assert(lshLoaded.signed.filter(
        col("vec_id").isin(sweptIds.toSeq: _*)).count() === 0,
        "LSH hides swept ids on the rerank side")

      // REPLAY after the successful sweep: the raw partitions are gone,
      // so a naive re-run would re-derive an EMPTY id set and overwrite
      // the tombstone batch — resurrecting every swept doc. The commit
      // record guard must keep the batch intact.
      Sink.retentionSweep(spark, raw, "2024-01-03", batchId = 0L,
        textIndexes = Seq(text), ivfIndexes = Seq(ivf),
        lshIndexes = Seq(lsh))
      assert(bm25(text) === bm25(refText), "post-drop replay: no drift")
      assert(Sink.readIvfIndex(spark, ivf).celled
        .select(col("vec_id")).as[Long].collect().toSet
        .intersect(sweptIds).isEmpty)

      // PARTIAL-drop replay: one doomed partition reappears (simulating
      // a crash mid-drop — or mid-sweep before the drop began), carrying
      // only a SUBSET of the originally swept ids. The re-run must SKIP
      // the tombstone write on every landed root (an overwrite with the
      // subset would resurrect the rest) and finish the drop.
      docs.filter(col("doc_id") % 5 === 0).withColumn("date",
          lit("2024-01-01"))
        .write.mode("append").partitionBy("date").parquet(raw)
      Sink.retentionSweep(spark, raw, "2024-01-03", batchId = 0L,
        textIndexes = Seq(text), ivfIndexes = Seq(ivf),
        lshIndexes = Seq(lsh))
      assert(!new java.io.File(s"$raw/date=2024-01-01").exists(),
        "the re-run finishes the partial drop")
      assert(bm25(text) === bm25(refText),
        "subset replay must not shrink the tombstone batch")

      // lineage composition: a swept URL is re-crawled later — an
      // append at batch 1 resurrects it (batch-scoped tombstones)
      val recrawled = docs.filter(col("doc_id") === 5) // % 5 == 0: swept
      Sink.appendTextIndex(spark, text, recrawled, batchId = 1L)
      val withReadd = Sink.readTextIndex(spark, text)
      assert(withReadd.nDocs === sweptN + 1,
        "re-crawl after sweep: the doc is visible again, no compaction")
    } finally rm(raw, text, ivf, lsh, refText)
  }

  test("ID CONTRACT: an id straddling a doomed and a retained partition " +
      "is masked from the index too (ids must be unique across dates); " +
      "a re-ingest at a later batch id survives the sweep's mask") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val raw = tmp("sweep_straddle_raw")
    val text = tmp("sweep_straddle_text")
    try {
      // doc 7 deliberately violates the contract: one copy under the
      // doomed date AND one under a retained date
      docs.withColumn("date",
          when(col("doc_id") === 7, lit("2024-01-01"))
            .otherwise(lit("2024-01-05")))
        .write.mode("overwrite").partitionBy("date").parquet(raw)
      docs.filter(col("doc_id") === 7).withColumn("date", lit("2024-01-05"))
        .write.mode("append").partitionBy("date").parquet(raw)
      Sink.writeTextIndex(docs, text, buckets = 8)
      Sink.retentionSweep(spark, raw, "2024-01-03", batchId = 0L,
        textIndexes = Seq(text))
      // the retained RAW copy survives, but the index masks the id:
      // tombstones are by id and the build's rows sit at row_batch = -1
      assert(spark.read.parquet(raw).filter(col("doc_id") === 7)
        .count() === 1L, "the retained raw copy is untouched")
      val masked = Sink.readTextIndex(spark, text)
      assert(masked.postings.filter(col("doc_id") === 7).count() === 0L,
        "the straddling id is masked from serving — the documented " +
          "(and spec-pinned) cost of violating id-uniqueness")
      assert(masked.nDocs === docs.count() - 1)
      // recovery is the normal lineage: re-ingest at a batch id ABOVE
      // the sweep's — batch-scoped masking keeps it visible
      Sink.appendTextIndex(spark, text,
        docs.filter(col("doc_id") === 7), batchId = 1L)
      val readd = Sink.readTextIndex(spark, text)
      assert(readd.postings.filter(col("doc_id") === 7).count() > 0L,
        "a post-sweep re-ingest survives the mask")
      assert(readd.nDocs === docs.count())
    } finally rm(raw, text)
  }

  test("reused batch id: a sweep whose batchId an UNRELATED delete " +
      "already consumed fails fast instead of silently skipping the " +
      "root (which would leave expiring docs servable)") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val raw = tmp("sweep_reuse_raw")
    val text = tmp("sweep_reuse_text")
    try {
      docs.withColumn("date",
          concat(lit("2024-01-0"), (col("doc_id") % 5 + 1).cast("string")))
        .write.mode("overwrite").partitionBy("date").parquet(raw)
      Sink.writeTextIndex(docs, text, buckets = 8)
      // an unrelated delete consumes batch 0 on this root — its id set
      // does NOT cover the dates the sweep will expire
      Sink.deleteFromTextIndex(spark, text,
        docs.filter(col("doc_id") === 58).select(col("doc_id")), // retained date
        batchId = 0L)
      val e = intercept[IllegalArgumentException] {
        Sink.retentionSweep(spark, raw, "2024-01-03", batchId = 0L,
          textIndexes = Seq(text))
      }
      assert(e.getMessage.contains("does NOT cover"),
        "the guard names the coverage gap")
      assert(new java.io.File(s"$raw/date=2024-01-01").exists(),
        "fail-fast happens BEFORE any raw partition drops")
    } finally rm(raw, text)
  }

  test("ARCHIVAL lineage (r16): sweeps alone trip the maintenance " +
      "valves — no ingest thread ever runs, yet repeated sweeps fold " +
      "the tombstone mass and serving returns to the clean layout") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val raw = tmp("sweep_arch_raw")
    val text = tmp("sweep_arch_text")
    val ivf = tmp("sweep_arch_ivf")
    val refText = tmp("sweep_arch_ref")
    try {
      docs.withColumn("date",
          concat(lit("2024-01-0"), (col("doc_id") % 5 + 1).cast("string")))
        .write.mode("overwrite").partitionBy("date").parquet(raw)
      Sink.writeTextIndex(docs, text, buckets = 8)
      val ivfIdx = Similarity.buildIvfIndexExact(emb, nlist = 4, iters = 1)
      Sink.writeIvfIndex(ivfIdx, ivf)
      ivfIdx.unpersist()

      // day 1: one expired date — default thresholds, pressure stays
      Sink.retentionSweep(spark, raw, "2024-01-02", batchId = 0L,
        textIndexes = Seq(text), ivfIndexes = Seq(ivf))
      assert(new java.io.File(s"$text/tombstones").exists() &&
        new java.io.File(s"$ivf/tombstones").exists(),
        "below thresholds the sweep's valves leave the masks live")

      // day 2: a second expired date pushes the batch count over a
      // tight maxBatches — the SWEEP's own valve call must fold both
      // roots (before r16 nothing would, ever, on this lineage)
      Sink.retentionSweep(spark, raw, "2024-01-03", batchId = 1L,
        textIndexes = Seq(text), ivfIndexes = Seq(ivf),
        maxBatches = 1L)
      val textRoot = Sink.resolveIndexRoot(spark, text)
      assert(!new java.io.File(s"$textRoot/tombstones").exists() &&
        !new java.io.File(s"$ivf/tombstones").exists(),
        "the sweep-run valves folded the masks on BOTH roots")

      // swept+folded state ≡ a fresh build over the retained docs
      Sink.writeTextIndex(docs.filter(col("doc_id") % 5 >= 2), refText,
        buckets = 8)
      assert(bm25(text) === bm25(refText),
        "archival fold preserves serving exactly")
      val sweptIds = docs.filter(col("doc_id") % 5 < 2)
        .select(col("doc_id")).as[Long].collect().toSet
      assert(Sink.readIvfIndex(spark, ivf).celled
        .select(col("vec_id")).as[Long].collect().toSet
        .intersect(sweptIds).isEmpty,
        "IVF: swept ids physically gone after the sweep-run fold")
    } finally rm(raw, text, ivf, refText)
  }

  test("REPLAY AFTER A VALVE FOLD (r16): a sweep batch id absorbed " +
      "into the folded ledger is trusted on replay — no coverage check " +
      "is possible (the fold deleted the id tables) and none throws; " +
      "the re-run just finishes the drop") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val raw = tmp("sweep_foldreplay_raw")
    val text = tmp("sweep_foldreplay_text")
    val refText = tmp("sweep_foldreplay_ref")
    try {
      docs.withColumn("date",
          concat(lit("2024-01-0"), (col("doc_id") % 5 + 1).cast("string")))
        .write.mode("overwrite").partitionBy("date").parquet(raw)
      Sink.writeTextIndex(docs, text, buckets = 8)
      // maxBatches = 0: the sweep's valve folds its OWN batch at once —
      // the tightest sweep→fold cycle
      Sink.retentionSweep(spark, raw, "2024-01-03", batchId = 0L,
        textIndexes = Seq(text), maxBatches = 0L)
      val textRoot = Sink.resolveIndexRoot(spark, text)
      assert(!new java.io.File(s"$textRoot/tombstones").exists(),
        "batch 0 folded in the same sweep")

      // crash-before-drop replay: a doomed partition reappears (subset
      // content), the batch id now lives ONLY in the folded ledger —
      // the replay must take the ledger skip (nothing left to verify
      // coverage against: the trust documented on retentionSweep),
      // write NO new tombstones, and finish the drop
      docs.filter(col("doc_id") % 5 === 0).withColumn("date",
          lit("2024-01-01"))
        .write.mode("append").partitionBy("date").parquet(raw)
      Sink.retentionSweep(spark, raw, "2024-01-03", batchId = 0L,
        textIndexes = Seq(text), maxBatches = Long.MaxValue)
      assert(!new java.io.File(s"$raw/date=2024-01-01").exists(),
        "the replay finishes the drop")
      assert(!new java.io.File(s"$textRoot/tombstones").exists(),
        "ledger skip: the replay writes no fresh tombstone batch")
      Sink.writeTextIndex(docs.filter(col("doc_id") % 5 >= 2), refText,
        buckets = 8)
      assert(bm25(text) === bm25(refText),
        "post-fold replay leaves serving exactly on the retained set")
    } finally rm(raw, text, refText)
  }

  test("sweep with no expiring partitions is a no-op; sweep on a " +
      "missing raw table returns empty") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 50)
    val raw = tmp("sweep_noop")
    val text = tmp("sweep_noop_text")
    try {
      docs.withColumn("date", lit("2024-06-01"))
        .write.mode("overwrite").partitionBy("date").parquet(raw)
      Sink.writeTextIndex(docs, text, buckets = 8)
      val dropped = Sink.retentionSweep(spark, raw, "2024-01-01",
        batchId = 0L, textIndexes = Seq(text))
      assert(dropped.isEmpty)
      assert(!new java.io.File(s"$text/tombstones").exists(),
        "nothing expired → no tombstone batch")
      assert(Sink.retentionSweep(spark, s"$raw/__absent__", "2024-01-01",
        batchId = 1L) === Nil)
    } finally rm(raw, text)
  }
}
