package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Similarity

/** Streaming ANN query serving — the ingest-time twin of the persisted
  * IVF index's batch query path, closing the last batch/streaming
  * asymmetry: indexes are built and persisted offline
  * ([[graft.sinks.Sink.writeIvfIndex]]), reloaded once at stream start
  * ([[graft.sinks.Sink.readIvfIndex]]), and a continuous stream of query
  * vectors `(query_id, embedding)` is answered per micro-batch by
  * [[Similarity.ivfQueryVectors]] — the same static-partition-pruned
  * probe the batch path runs, so each batch provably reads only its
  * probed cell directories (≤ batch × nprobe of nlist), never the
  * corpus.
  *
  * Delivery: the `emit(batchId, results)` callback receives Spark's
  * replay-stable batch id; a restart from the checkpoint re-runs at most
  * the in-flight batch with the SAME id, so a batchId-keyed idempotent
  * sink (overwrite-by-batch-directory, upsert-by-(batchId, query_id))
  * yields exactly-once results across kill/recover — the contract every
  * foreachBatch sink in this engine shares, spec-asserted with a real
  * kill + restart in StreamAnnServeSpec.
  *
  * 100 TB shape: the index stays on disk in its cell-partitioned layout
  * (the reload collects only the nlist × dim centroid doubles); per
  * micro-batch work is probe-union collection (batch × nprobe ints) +
  * a scan of the probed directories + a broadcast join against the
  * request batch. Index refresh is a new path + stream restart — the
  * offline build/online serve split of every production ANN system.
  */
object StreamAnnServe {

  /** `queries` must be a STREAMING DataFrame with `(query_id, embedding)`
    * columns. Caller attaches checkpointLocation and starts.
    */
  def servedWriter(
      queries: DataFrame,
      index: Similarity.IvfIndex,
      k: Int = 10,
      nprobe: Int = 4)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, Similarity.ivfQueryVectors(index, batch, k, nprobe))
        ()
      }

  /** The IVF-PQ twin — production serving against the persisted IVF-PQ
    * layout ([[graft.sinks.Sink.readIvfPqIndex]]): per micro-batch,
    * [[Similarity.ivfPqQueryVectors]] answers the request batch with the
    * same static cell pruning, a code-only ADC candidate scan (full-width
    * vectors leave disk only for the ≤ batch × rerank shortlist), and the
    * exact cosine rerank. Same batchId-keyed exactly-once delivery
    * contract as [[servedWriter]], spec-asserted with a real kill +
    * restart in StreamAnnServeSpec.
    */
  def servedPqWriter(
      queries: DataFrame,
      index: Similarity.IvfIndex,
      pqCents: Array[Array[Array[Long]]],
      k: Int = 10,
      nprobe: Int = 12,
      rerank: Int = 64)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, Similarity.ivfPqQueryVectors(
          index, pqCents, batch, nprobe, rerank, k))
        ()
      }

  /** The LSH twin — serving against the persisted SRP-LSH layout
    * ([[graft.sinks.Sink.readLshIndex]]): per micro-batch,
    * [[Similarity.lshQueryVectors]] signs the request vectors with the
    * index's persisted hyperplanes, multi-probes their band buckets
    * through the static combined-key partition predicate, and reranks
    * by exact cosine. Same batchId-keyed exactly-once delivery contract.
    */
  def servedLshWriter(
      queries: DataFrame,
      index: Similarity.PersistedLshIndex,
      k: Int = 10)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, Similarity.lshQueryVectors(index, batch, k))
        ()
      }
}
