package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sinks.Sink

/** Continuous embedding ingest into a persisted IVF index — the
  * write-side streaming twin of [[StreamAnnServe]], completing the index
  * lifecycle: offline build ([[graft.operators.Similarity.buildIvfIndex]]
  * → [[Sink.writeIvfIndex]]), online ADD (this — new vectors from a
  * stream join the index under the already-trained coarse quantizer,
  * never a retrain), online serve ([[StreamAnnServe]] — queries see
  * ingested vectors on their next batch), periodic maintenance
  * ([[Sink.compact]] / rebuild when cell balance drifts).
  *
  * Exactly-once: each micro-batch lands via
  * [[Sink.appendIvfIndex]]'s dynamic partition overwrite keyed on the
  * replay-stable `batch_id` partition level, so a kill/restart that
  * re-runs the in-flight batch overwrites its own directories instead of
  * duplicating vectors — spec-asserted with a real kill + replay.
  *
  * 100 TB shape: per batch, ONE narrow pass over the new rows (broadcast
  * centroid literals, codegen'd argmax) and one partitioned write of
  * batch-sized data — index size never enters the ingest cost; the
  * gated valve ([[Sink.compactIvfIndexIfNeeded]], run by this writer's
  * own foreachBatch thread — the single-maintainer contract holds by
  * construction, exactly the [[StreamTextIngest]] stance) amortizes
  * both the small-file debt AND tombstone pressure (a retention sweep
  * targeting this index path lands delete batches on the same lineage;
  * the valve folds their masks before the broadcast stops fitting).
  */
object StreamAnnIngest {

  /** `vectors` must be a STREAMING DataFrame with `(vec_id, embedding)`
    * columns; `indexPath` a [[Sink.writeIvfIndex]] layout. The valve
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
        Sink.appendIvfIndex(spark, indexPath, batch, batchId)
        Sink.compactIvfIndexIfNeeded(
          spark, indexPath, maxIngestedFiles, maxBatches, maxMaskedIds)
        ()
      }
}
