package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Census
import graft.sinks.Sink

/** STREAMING twin of the [[graft.operators.Census]] distinct-census
  * lifecycle: an unbounded keyed stream maintained as a per-group HLL
  * sketch table that is always one micro-batch behind the stream — the
  * continuous-aggregate stance of the reference (TimescaleDB hypertable
  * + retention policy, `/root/reference/migrations/001_initial_schema
  * .sql:34-35`) applied to COUNT(DISTINCT), the one aggregate a
  * windowed sum can't maintain.
  *
  * Per epoch: ONE narrow scan of the batch into per-group partial
  * sketches (map-side combine — reducer state is sketch-sized, never
  * key-set-sized), then [[Sink.mergeCensusTable]] folds the delta into
  * the persisted census under a generation-directory commit. No
  * watermark and no state store: the census is union-only algebra, so
  * late rows are simply merged when they arrive — there is no window to
  * close and nothing to expire. Any roll-up (coarser groups, global)
  * runs on the census table alone via [[Census.rollup]]; the stream's
  * history is never rescanned.
  *
  * Exactly-once across kill/replay is spec-asserted two independent
  * ways (StreamCensusSpec): the batchId transactional guard skips
  * redelivered epochs, and — the belt under that suspender — HLL
  * register-max union makes even a double-merged delta bit-identical.
  */
object StreamCensus {

  /** `events` must be a STREAMING DataFrame. Sketches `keyCol` distinct
    * per `groupCols` each micro-batch and folds the delta into the
    * census table at `tablePath`. Caller attaches checkpointLocation
    * and starts.
    */
  def censusWriter(
      events: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      tablePath: String,
      lgK: Int = 12): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sink.mergeCensusTable(
          batch.sparkSession, tablePath,
          Census.distinctSketch(batch, keyCol, groupCols, lgK),
          groupCols, batchId)
        ()
      }

  /** THETA twin of [[censusWriter]]: maintains a per-group theta-sketch
    * table instead of HLL — same generation-commit lifecycle, same
    * exactly-once pair (batchId guard + retained-set-idempotent union),
    * but the persisted census additionally answers SET-ALGEBRA questions
    * ([[Census.overlapFromCensus]]: overlap/Jaccard between any two
    * groups) without ever rescanning the stream — exactly while every
    * group stays under 2^lgK distinct keys, bounded-error beyond.
    */
  def thetaCensusWriter(
      events: DataFrame,
      keyCol: String,
      groupCols: Seq[String],
      tablePath: String,
      lgK: Int = 12): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sink.mergeThetaCensusTable(
          batch.sparkSession, tablePath,
          Census.thetaSketchTable(batch, keyCol, groupCols, lgK),
          groupCols, batchId, lgK)
        ()
      }

  /** KLL QUANTILE twin of [[censusWriter]]: maintains a per-group
    * quantile-sketch table — every percentile/rank/drift question over
    * the stream's whole history answered from census rows
    * ([[Census.quantilesFromCensus]], [[Census.distributionDrift]])
    * without rescanning or re-windowing it. CONTRACT DIFFERENCE from
    * the HLL/theta twins: KLL merge is counting algebra with no
    * idempotence backstop, so the batchId guard inside
    * [[Sink.mergeKllCensusTable]] carries exactly-once alone —
    * spec-asserted (StreamCensusSpec) the same two ways the guard
    * itself is.
    */
  def kllCensusWriter(
      events: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      tablePath: String,
      k: Int = 200): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sink.mergeKllCensusTable(
          batch.sparkSession, tablePath,
          Census.quantileSketchTable(batch, valueCol, groupCols, k),
          groupCols, batchId, k)
        ()
      }

  /** FREQUENT-ITEMS twin of [[censusWriter]]: maintains a per-group
    * heavy-hitter sketch table — "which items dominate, over all
    * history" from ≤ maxMapSize counters per group
    * ([[Census.heavyHittersFromCensus]]). Counting algebra: the batchId
    * guard carries exactly-once alone, like the KLL twin.
    */
  def freqCensusWriter(
      events: DataFrame,
      itemCol: String,
      groupCols: Seq[String],
      tablePath: String,
      maxMapSize: Int = 1024): DataStreamWriter[Row] =
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sink.mergeFreqCensusTable(
          batch.sparkSession, tablePath,
          Census.freqSketchTable(batch, itemCol, groupCols, maxMapSize),
          groupCols, batchId, maxMapSize)
        ()
      }
}
