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
  * batch-sized data — index size never enters the ingest cost.
  */
object StreamAnnIngest {

  /** `vectors` must be a STREAMING DataFrame with `(vec_id, embedding)`
    * columns; `indexPath` a [[Sink.writeIvfIndex]] layout. Caller
    * attaches checkpointLocation and starts.
    */
  def ingestWriter(
      vectors: DataFrame,
      indexPath: String): DataStreamWriter[Row] =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sink.appendIvfIndex(batch.sparkSession, indexPath, batch, batchId)
        ()
      }
}
