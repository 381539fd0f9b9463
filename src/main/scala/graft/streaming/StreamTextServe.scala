package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.TextAnalysis

/** Streaming BM25 query serving — the text leg of the serving family
  * (IVF / IVF-PQ / LSH / text), same build-offline/serve-online split:
  * the inverted index is built and persisted offline
  * ([[graft.sinks.Sink.writeTextIndex]]), reloaded once at stream start,
  * and a continuous stream of search requests `(query_id,
  * terms array<string>)` is answered per micro-batch by
  * [[TextAnalysis.bm25QueryBatch]] — the probe is the union of the
  * batch's terms, pushed as a static `bucket IN (...)` partition
  * predicate, so each batch provably reads only its probed bucket
  * directories (≤ batch-distinct-terms of `buckets`), never the corpus.
  *
  * Delivery: the `emit(batchId, results)` callback receives Spark's
  * replay-stable batch id — the same batchId-keyed idempotent-sink
  * exactly-once contract every foreachBatch writer in this engine
  * shares, spec-asserted with a real kill + restart in
  * StreamTextServeSpec.
  *
  * 100 TB shape: the index stays on disk in its bucket-partitioned
  * layout (the reload collects 3 meta scalars); per micro-batch work is
  * the request-batch term collect + a scan of the probed directories
  * (Σ df posting rows) + a broadcast join against the request batch.
  * Index refresh is a new path + stream restart — the offline-build/
  * online-serve split of every production search system.
  */
object StreamTextServe {

  /** `requests` must be a STREAMING DataFrame with `(query_id,
    * terms array<string>)` columns. Caller attaches checkpointLocation
    * and starts.
    */
  def bm25Writer(
      requests: DataFrame,
      index: TextAnalysis.TextIndex,
      k: Int = 20)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, TextAnalysis.bm25QueryBatch(index, batch, k))
        ()
      }

  /** The PHRASE serving twin — [[bm25Writer]] answering exact-phrase
    * requests `(query_id, phrase array<string>)` per micro-batch via
    * [[TextAnalysis.phraseQueryBatch]]: one pruned probe for the
    * batch's term union, slot-shifted anchor intersection per request,
    * occurrence-ranked top-k. Same delivery contract (replay-stable
    * batchId to an idempotent `emit`) and the same 100 TB posture: the
    * positional index stays on disk, per-batch work is bounded by the
    * probed buckets' matched postings + Σ tf anchor rows.
    */
  def phraseWriter(
      requests: DataFrame,
      index: TextAnalysis.TextIndex,
      k: Int = 20)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, TextAnalysis.phraseQueryBatch(index, batch, k))
        ()
      }

  /** The PROXIMITY serving twin, completing the trio — min-window
    * ranking per request `(query_id, terms array<string>)` via
    * [[TextAnalysis.proximityQueryBatch]], same probe-union pruning and
    * replay-stable-batchId delivery as the BM25 and phrase writers.
    */
  def proximityWriter(
      requests: DataFrame,
      index: TextAnalysis.TextIndex,
      k: Int = 20)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, TextAnalysis.proximityQueryBatch(index, batch, k))
        ()
      }

  /** The SNIPPET serving twin — requests `(query_id,
    * terms array<string>)` answered per micro-batch by
    * [[TextAnalysis.snippetQueryBatch]]: min-window argmin per (query,
    * doc), one winner-id push-down into the documents scan per batch,
    * the rendered token span per hit. Same probe-union pruning and
    * replay-stable-batchId delivery as the other three writers.
    */
  def snippetWriter(
      requests: DataFrame,
      index: TextAnalysis.TextIndex,
      docs: DataFrame,
      k: Int = 20)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId,
          TextAnalysis.snippetQueryBatch(index, docs, batch, k))
        ()
      }

  /** HYBRID serving — requests carry BOTH legs' inputs `(query_id,
    * terms array<string>, embedding array)`, answered per micro-batch
    * by [[TextAnalysis.rrfQueryBatch]]: the bucket-pruned BM25 leg and
    * the cell-pruned integer-lattice ANN leg (exact-Lloyd persisted
    * index) fused per (query_id, doc_id) by integer-ppm RRF. Delivery
    * contract unchanged: replay-stable batchId to an idempotent `emit`.
    */
  def hybridWriter(
      requests: DataFrame,
      index: TextAnalysis.TextIndex,
      annIndex: graft.operators.Similarity.IvfIndex,
      k: Int = 20,
      kConst: Long = 60L,
      legK: Int = 50,
      nprobe: Int = 4)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, TextAnalysis.rrfQueryBatch(
          index, annIndex, batch, kConst, k, legK, nprobe))
        ()
      }

  /** The SEARCH-RESULTS-PAGE writer — [[hybridWriter]] plus snippet
    * evidence per fused hit, answered per micro-batch by
    * [[TextAnalysis.rrfSnippetQueryBatch]]: fused top-k per request,
    * best covering window + token span for winners that carry every
    * term, NULL evidence for semantic-only hits. Delivery contract
    * unchanged: replay-stable batchId to an idempotent `emit`.
    */
  def hybridSnippetWriter(
      requests: DataFrame,
      index: TextAnalysis.TextIndex,
      annIndex: graft.operators.Similarity.IvfIndex,
      docs: DataFrame,
      k: Int = 20,
      kConst: Long = 60L,
      legK: Int = 50,
      nprobe: Int = 4)(
      emit: (Long, DataFrame) => Unit): DataStreamWriter[Row] =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        emit(batchId, TextAnalysis.rrfSnippetQueryBatch(
          index, annIndex, docs, batch, kConst, k, legK, nprobe))
        ()
      }
}
