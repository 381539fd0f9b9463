package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** One (doc, band) probe row entering the bucket state. */
final case class BandProbe(
    doc_id: Long, ts: Timestamp, sh: Long, band: Int, bucket: Long)

/** Per-band verdict: `hit` = some earlier-seen doc in this band's bucket
  * is within the Hamming radius of this doc's signature.
  */
final case class BandHit(doc_id: Long, ts: Timestamp, band: Int, hit: Boolean)

/** State per (band, bucket): full 64-bit signatures of the docs that have
  * claimed this bucket, newest event time last touched. A signature is 8
  * bytes — a bucket holding its cap of 64 costs ~0.5 KB, so state is
  * bounded by (live buckets within watermark) × cap × 8 bytes however
  * large the stream.
  */
final case class BucketSigs(sigs: List[Long], lastMs: Long)

/** Streaming NEAR-duplicate suppression — the ingest-time twin of
  * [[Dedup.simhashPairs]] for a training-data feed: admit a document only
  * if no already-seen document (within the watermark horizon) has a
  * SimHash within Hamming distance `maxDist`. Exact-dup streaming dedup
  * (`dropDuplicatesWithinWatermark`, StreamingDedupSpec) catches byte
  * dups; this catches the boilerplate/near-copy storms that dominate
  * web-scale feeds, with per-key state a LIST OF 64-BIT LONGS — not
  * shingle sets, not text.
  *
  * Semantics (same pigeonhole as the batch operator): hamming ≤ 3 ⇒ the
  * two signatures agree on ≥ 1 of the four 16-bit bands ⇒ the later doc
  * probes the bucket the earlier one claimed and the comparison happens.
  * So within the watermark horizon and bucket cap, suppression equals the
  * brute-force "hamming ≤ maxDist vs some earlier doc" criterion exactly
  * — banding adds no false negatives, and false positives are only what
  * SimHash-as-similarity itself admits. Every doc claims all four of its
  * buckets whether or not it was suppressed, so near-dups of a SUPPRESSED
  * doc are suppressed too (chained, like keep-first clustering).
  *
  * Scale shape: the signature is a narrow codegen'd map; the only shuffle
  * keys are (band, 16-bit bucket) — 4 rows of 28 bytes per doc, text
  * never enters the stateful exchange. State evicts by event-time timeout
  * at the watermark delay; `maxPerBucket` caps degenerate buckets (a
  * boilerplate storm maps to ONE bucket — identical signatures are stored
  * once, so the common storm costs one slot, and an adversarial
  * all-distinct-sig flood stops being remembered past the cap rather
  * than growing state).
  */
object StreamingNearDup extends Serializable {

  /** THE banded-signature bucket kernel, shared by every stateful
    * near-dup consumer ([[bandFlags]], [[StreamCuration.curatedFlags]],
    * [[StreamBuildReport.censusFlags]]): probe the bucket's stored
    * signatures for a hit within `maxDist`, admit the row's signature
    * (stored once, capped at `maxPerBucket`), advance last-seen, and
    * re-arm the watermark-clamped eviction timeout. Centralized so the
    * suppression/eviction semantics cannot drift between the three
    * stateful operators (the sniff/decoder drift lesson,
    * [[graft.operators.Multimodal]] `readImage`).
    *
    * `rows` must already be in (event-time, doc) order; returns each row
    * zipped with its hit flag. Callers handle `state.hasTimedOut`
    * (remove + empty) before calling.
    */
  private[graft] def probeBucket[T](
      rows: Seq[T],
      state: GroupState[BucketSigs],
      delayMs: Long,
      maxDist: Int,
      maxPerBucket: Int)(tsMs: T => Long, sig: T => Long): Seq[(T, Boolean)] = {
    var sigs = state.getOption.map(_.sigs).getOrElse(Nil)
    var lastMs = state.getOption.map(_.lastMs).getOrElse(0L)
    val out = rows.map { r =>
      val s0 = sig(r)
      val hit = sigs.exists(s => java.lang.Long.bitCount(s ^ s0) <= maxDist)
      if (!sigs.contains(s0) && sigs.size < maxPerBucket) sigs = s0 :: sigs
      lastMs = math.max(lastMs, tsMs(r))
      (r, hit)
    }
    state.update(BucketSigs(sigs, lastMs))
    // same clamp as Sessionize.streamingSessions: a timeout at/behind
    // the current watermark throws — evicting one watermark-tick late
    // only keeps a bucket warm slightly longer, never loses a doc
    state.setTimeoutTimestamp(
      math.max(lastMs + delayMs, state.getCurrentWatermarkMs() + 1))
    out
  }

  /** Per-(doc, band) hit flags for a streaming `docs(doc_id, text, ts)`.
    * All four band rows of a document derive narrowly from its input row,
    * so they always land — and emit — in the same micro-batch; the
    * per-doc OR over them is an ordinary batch aggregation inside
    * `foreachBatch` ([[suppressedWriter]]), not a second stateful
    * operator.
    */
  def bandFlags(
      docs: DataFrame,
      maxDist: Int = 3,
      delayMinutes: Int = 60,
      maxPerBucket: Int = 64): Dataset[BandHit] = {
    require(maxDist <= 3,
      s"4x16-bit banding guarantees recall only for hamming <= 3, got $maxDist")
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = delayMinutes * 60L * 1000L

    def update(
        key: (Int, Long),
        rows: Iterator[BandProbe],
        state: GroupState[BucketSigs]): Iterator[BandHit] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        probeBucket(rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)),
          state, delayMs, maxDist, maxPerBucket)(_.ts.getTime, _.sh)
          .map { case (r, hit) => BandHit(r.doc_id, r.ts, r.band, hit) }
          .iterator
      }
    }

    def chunk(sh: org.apache.spark.sql.Column, b: Int) =
      shiftright(sh, b * 16).bitwiseAND(0xffffL)

    val sh = docs
      .select(col("doc_id").cast("long"), col("ts"),
        Dedup.simhash(col("text")).as("sh"))
      .withWatermark("ts", s"$delayMinutes minutes")
    sh.select(col("doc_id"), col("ts"), col("sh"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"), chunk(col("sh"), b).as("bucket"))): _*))
          .as("bb"))
      .select(col("doc_id"), col("ts"), col("sh"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .as[BandProbe]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Admitted-docs sink: per micro-batch, OR the four band flags per doc
    * (exact — see [[bandFlags]] on the same-batch invariant) and hand the
    * surviving `(doc_id, ts)` rows to `write`.
    */
  def suppressedWriter(
      docs: DataFrame,
      maxDist: Int = 3,
      delayMinutes: Int = 60,
      maxPerBucket: Int = 64)(
      write: DataFrame => Unit): DataStreamWriter[Row] =
    bandFlags(docs, maxDist, delayMinutes, maxPerBucket)
      .toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        write(batch.groupBy(col("doc_id"), col("ts"))
          .agg(max(when(col("hit"), 1).otherwise(0)).as("suppressed"))
          .filter(col("suppressed") === 0)
          .select(col("doc_id"), col("ts")))
      }
}
