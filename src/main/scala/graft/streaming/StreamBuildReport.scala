package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, TextAnalysis}

/** One per-(doc, band) verdict row carrying the doc's earlier-stage
  * flags. Docs that failed quality or decontam ride in their OWN group
  * (`band` = -1) so they reach the census without touching bucket state.
  */
final case class CensusProbe(
    doc_id: Long, ts: Timestamp, sh: Long, band: Int, bucket: Long,
    q_pass: Boolean, d_pass: Boolean, meta: String)

/** Stage-flagged verdict: `hit` = near-dup suppressed (only meaningful
  * when both earlier flags hold; false otherwise).
  */
final case class CensusVerdict(
    doc_id: Long, ts: Timestamp, band: Int,
    q_pass: Boolean, d_pass: Boolean, hit: Boolean, meta: String)

/** STREAMING twin of [[graft.operators.Curation.buildReport]]'s census:
  * the composed ingest pipeline (quality gate → benchmark decontam →
  * near-dup suppression) run as ONE recoverable query that emits, per
  * epoch, both the admitted documents and the census rows
  * `(stage, n_docs)` counting how many of the epoch's documents survive
  * each stage prefix — the live funnel dashboard of a corpus build.
  *
  * Census mechanics — stage FLAGS, not stage filters: every document
  * flows the whole pipeline carrying `(q_pass, d_pass)` flags, and the
  * sink derives all stage counts from the flags in ONE pass over the
  * epoch's verdicts. This is the streaming analog of the batch census's
  * materialized frontiers: each stage is counted exactly once per epoch
  * by construction — there is no per-branch recomputation to avoid,
  * because there are no branches. Semantics still compose in stage
  * order: a document that failed an earlier stage never enters near-dup
  * BUCKET STATE (it is routed to a dead-letter group, `band` = -1), so
  * the signature store evolves exactly as [[StreamCuration]]'s filtered
  * composition — failing docs can neither suppress nor be suppressed.
  *
  * Scope (documented, not an omission): URL dedup and per-source caps
  * are CROSS-EPOCH GLOBAL operators — their survivor sets depend on the
  * entire corpus, not any watermark-bounded window — so they remain
  * batch stages; [[graft.operators.Curation.buildReport]] stays the
  * whole-corpus audit, and this census covers the ingest-time stages a
  * stream can decide exactly (quality, decontam, near-dup within the
  * watermark horizon).
  *
  * Recovery contract (StreamBuildCensusSpec): kill between epochs and
  * restart from the checkpoint — bucket state survives (a near-dup of a
  * pre-kill admitted doc is still suppressed), and because every census
  * row is keyed by `batchId`, a replayed epoch overwrites its own slot:
  * census totals across the kill/replay history count every document
  * exactly once (idempotent last-write-wins sink, the A9/A10 contract).
  */
object StreamBuildReport {

  /** Stage-flagged per-(doc, band) verdicts for a streaming
    * `docs(doc_id, text, ts, carryCols…)` against the static benchmark
    * `reference(text)`. Semantics per stage match [[StreamCuration]]
    * ([[TextAnalysis.withQuality]] threshold; exact normalized-content
    * anti-membership; banded-SimHash store, watermark-evicted).
    */
  def censusFlags(
      docs: DataFrame,
      reference: DataFrame,
      minQuality: Double = 0.5,
      carryCols: Seq[String] = Seq("lang"),
      maxDist: Int = 3,
      delayMinutes: Int = 60,
      maxPerBucket: Int = 64): org.apache.spark.sql.Dataset[CensusVerdict] = {
    require(maxDist <= 3,
      s"4x16-bit banding guarantees recall only for hamming <= 3, got $maxDist")
    val spark = docs.sparkSession
    import spark.implicits._
    val delayMs = delayMinutes * 60L * 1000L

    // stage flags (both computed without dropping rows): quality is the
    // narrow scorer; decontam is an exact content-key membership against
    // the static reference key set (broadcast-sized: 16-byte keys), the
    // SAME key rule as StreamDecontam.cleanStream
    val key = StreamDecontam.contentKey
    val refKeys = reference.select(key.as("content_key")).distinct()
      .withColumn("_contam", lit(true))
    val flagged = TextAnalysis.withQuality(docs)
      .withColumn("q_pass", col("quality_score") >= minQuality)
      .withColumn("content_key", key)
      .join(broadcast(refKeys), Seq("content_key"), "left")
      .withColumn("d_pass", col("_contam").isNull)
      .select((Seq(col("doc_id"), col("ts"), col("text"),
        col("q_pass"), col("d_pass")) ++ carryCols.map(col)): _*)

    def update(
        k: (Int, Long),
        rows: Iterator[CensusProbe],
        state: GroupState[BucketSigs]): Iterator[CensusVerdict] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else if (k._1 < 0) {
        // dead-letter group: earlier-stage rejects pass through to the
        // census untouched — no state is read or written
        rows.map(r => CensusVerdict(
          r.doc_id, r.ts, r.band, r.q_pass, r.d_pass, hit = false, r.meta))
      } else {
        StreamingNearDup.probeBucket(
          rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)),
          state, delayMs, maxDist, maxPerBucket)(_.ts.getTime, _.sh)
          .map { case (r, hit) =>
            CensusVerdict(r.doc_id, r.ts, r.band, r.q_pass, r.d_pass, hit,
              r.meta)
          }
          .iterator
      }
    }

    def chunk(sh: org.apache.spark.sql.Column, b: Int) =
      shiftright(sh, b * 16).bitwiseAND(0xffffL)
    val alive = col("q_pass") && col("d_pass")
    val sh = flagged
      .select(col("doc_id").cast("long"), col("ts"),
        Dedup.simhash(col("text")).as("sh"),
        col("q_pass"), col("d_pass"),
        to_json(struct(carryCols.map(col): _*)).as("meta"))
      .withWatermark("ts", s"$delayMinutes minutes")
    sh.select(col("doc_id"), col("ts"), col("sh"),
        col("q_pass"), col("d_pass"), col("meta"),
        // survivors probe their 4 band buckets; rejects take one
        // dead-letter row in their own group
        explode(when(alive,
          array((0 until 4).map(b =>
            struct(lit(b).as("band"), chunk(col("sh"), b).as("bucket"))): _*))
          .otherwise(array(
            struct(lit(-1).as("band"), col("doc_id").as("bucket"))))).as("bb"))
      .select(col("doc_id"), col("ts"), col("sh"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"),
        col("q_pass"), col("d_pass"), col("meta"))
      .as[CensusProbe]
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Census + admitted-doc sink over [[censusFlags]]: per micro-batch,
    * OR the band verdicts per doc (all of a doc's rows land in the same
    * micro-batch — the [[StreamingNearDup.bandFlags]] contract), derive
    * the four stage counts from the flags in one aggregate pass, and
    * hand `write` the epoch's census rows plus the admitted documents.
    * `write(batchId, census, admitted)` receives the batchId so sinks
    * are idempotent under epoch replay — census stages, in funnel
    * order: `input`, `quality`, `decontam`, `admitted`.
    */
  def censusWriter(
      docs: DataFrame,
      reference: DataFrame,
      minQuality: Double = 0.5,
      carryCols: Seq[String] = Seq("lang"),
      maxDist: Int = 3,
      delayMinutes: Int = 60,
      maxPerBucket: Int = 64)(
      write: (Long, Seq[(String, Long)], DataFrame) => Unit): DataStreamWriter[Row] = {
    val metaSchema = s"struct<${carryCols.map(c => s"$c:string").mkString(",")}>"
    censusFlags(docs, reference, minQuality, carryCols, maxDist,
      delayMinutes, maxPerBucket)
      .toDF()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the census aggregate AND the admitted-doc handoff both act on
        // this batch — persist so the stateful micro-batch plan (quality
        // scan, decontam join, simhash, state-store pass) executes once,
        // not once per downstream action
        batch.persist()
        try {
        val perDoc = batch
          .groupBy(col("doc_id"), col("ts"), col("meta"))
          .agg(
            max(when(col("q_pass"), 1).otherwise(0)).as("q"),
            max(when(col("d_pass"), 1).otherwise(0)).as("d"),
            max(when(col("hit"), 1).otherwise(0)).as("suppressed"))
        val c = perDoc.agg(
          count(lit(1)).as("n_input"),
          sum(col("q")).as("n_quality"),
          sum(col("q") * col("d")).as("n_decontam"),
          sum(col("q") * col("d") * (lit(1) - col("suppressed")))
            .as("n_admitted"))
          .collect()(0)
        val census = Seq(
          "input" -> c.getLong(0),
          "quality" -> Option(c.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
          "decontam" -> Option(c.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L),
          "admitted" -> Option(c.get(3)).map(_.asInstanceOf[Long]).getOrElse(0L))
        val admitted = perDoc
          .filter(col("q") === 1 && col("d") === 1 && col("suppressed") === 0)
          .withColumn("m", from_json(col("meta"),
            org.apache.spark.sql.types.DataType.fromDDL(metaSchema)))
          .select((Seq(col("doc_id"), col("ts")) ++
            carryCols.map(cc => col(s"m.$cc").as(cc))): _*)
        write(batchId, census, admitted)
        } finally { batch.unpersist(); () }
      }
  }
}
