package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time flood detection: windowed Misra-Gries heavy hitters over a
  * streaming token/key stream — "what is flooding my corpus RIGHT NOW",
  * the streaming twin of `TextAnalysis.heavyHitters`.
  *
  * The MG sketch is a `TypedImperativeAggregate`
  * ([[graft.functions.FreqSketch]]), so it rides an ordinary watermarked
  * window aggregation: partial buffers are capacity-bounded and merge
  * associatively, which is exactly what incremental micro-batch execution
  * needs — per-window state is ONE ≤capacity-entry summary no matter how
  * many tokens the window saw, and each micro-batch folds its partials
  * into that state with the same PODS'12 merge rule the batch operator
  * uses (merge invariance is property-tested in FreqSketchSpec, which is
  * precisely the micro-batch-order independence the stream relies on).
  *
  * 100 TB/day shape: state size = windows-in-horizon × capacity entries —
  * independent of stream rate; the watermark finalizes and evicts old
  * windows. Per-batch work is one map-side sketch fold + a
  * capacity-sized state merge per window — no token-level state, no
  * per-key timers.
  *
  * Output: one row per (window, rank) — the summary entries in
  * deterministic (est desc, token) order with the MG one-sided error
  * bound (est ≤ true ≤ est + max_underestimate) carried per row.
  */
object StreamHeavyHitters {

  def windowedHeavyHitters(
      tokens: DataFrame, // (ts timestamp, token string)
      capacity: Int = 32,
      watermark: String = "10 minutes",
      bucket: String = "1 hour"): DataFrame =
    tokens
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), bucket))
      .agg(graft.functions.FreqSketch.freq_sketch(col("token"), capacity)
        .as("sketch"))
      .select(col("window"), posexplode(col("sketch")).as(Seq("rank", "entry")))
      .select(
        col("window.start").as("window_start"),
        col("rank").cast("long").as("rank"),
        col("entry.item").as("token"),
        col("entry.est").as("est_count"),
        col("entry.err").as("max_underestimate"))
}
