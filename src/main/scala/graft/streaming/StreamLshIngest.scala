package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sinks.Sink

/** Continuous embedding ingest into a persisted LSH index — the
  * [[StreamAnnIngest]] twin for the SRP-LSH layout, completing ITS
  * lifecycle: offline build ([[graft.operators.Similarity.buildLshIndex]]
  * → [[Sink.writeLshIndex]]), online ADD (this — new vectors are signed
  * with the PERSISTED hyperplanes, never a resample, and their postings
  * land bucket-partitioned), online query
  * ([[graft.operators.Similarity.lshQueryPruned]] sees ingested vectors
  * on its next call), periodic maintenance ([[Sink.compactLshIndex]]
  * folds the per-batch files back into the base tables).
  *
  * Exactly-once: each micro-batch lands via [[Sink.appendLshIndex]]'s
  * dynamic partition overwrite keyed on the replay-stable `batch_id`
  * partition level — a kill/restart that re-runs the in-flight batch
  * overwrites its own directories instead of duplicating postings;
  * spec-asserted with a real replay in StreamLshIngestSpec.
  *
  * 100 TB shape: per batch, one narrow pass over the new rows (nBits
  * broadcast hyperplane dots, codegen'd sign bits) + one bucket-
  * partitioned write of batch-sized postings — index size never enters
  * the ingest cost; the gated valve ([[Sink.compactLshIndexIfNeeded]],
  * run by this writer's own foreachBatch thread — single-maintainer by
  * construction) amortizes both the small-file debt and tombstone
  * pressure at a bounded cadence, the [[StreamAnnIngest]] stance.
  */
object StreamLshIngest {

  /** `vectors` must be a STREAMING DataFrame with `(vec_id, embedding)`
    * columns; `indexPath` a [[Sink.writeLshIndex]] layout. The valve
    * fires when the ingested layout or the committed tombstones exceed
    * any threshold (pass `Long.MaxValue` to disable and run maintenance
    * externally); thresholds default to the index's persisted
    * [[Sink.ValvePolicy]] (else the family built-ins), so a sweep
    * maintainer and this writer weigh the SAME limits. Caller attaches
    * checkpointLocation and starts.
    */
  def ingestWriter(
      vectors: DataFrame,
      indexPath: String,
      maxIngestedFiles: Long = Sink.UsePersistedPolicy,
      maxBatches: Long = Sink.UsePersistedPolicy,
      maxMaskedIds: Long = Sink.UsePersistedPolicy): DataStreamWriter[Row] =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        Sink.appendLshIndex(spark, indexPath, batch, batchId)
        Sink.compactLshIndexIfNeeded(
          spark, indexPath, maxIngestedFiles, maxBatches, maxMaskedIds)
        ()
      }
}
