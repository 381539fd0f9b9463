package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join: correlate each `first`-type event with
  * every `second`-type event of the same key landing within a bounded
  * event-time window after it (click → purchase-within-30-min — the
  * attribution/conversion shape).
  *
  * The reference has no joins at all (SURVEY.md §2D); this is Table-C+
  * surface built the Structured-Streaming way: an inner stream-stream
  * join whose event-time RANGE condition is what makes unbounded state
  * bounded — Spark derives from `second_ts ∈ [first_ts, first_ts+gap]`
  * plus both watermarks exactly when a buffered row can never match
  * again and evicts it. Without the range bound, stream-stream join
  * state grows forever; with it, state ≈ gap × arrival rate per side.
  *
  * Batch twin ([[followWithinBatch]], query `q_follow_within`) is an
  * equi-join on the key with the window as an inline post-filter on the
  * join output — never a cross product, pair work bounded per key.
  * Time arithmetic on both paths (and the DuckDB oracle) runs on
  * microsecond longs, dodging ns-vs-µs parquet truncation skew.
  */
object StreamJoin {

  private def usOf(t: org.apache.spark.sql.Column) = unix_micros(t)

  /** All (first_id, second_id) pairs with the same `user_id` where the
    * second event's time lies in [first.ts, first.ts + gapMinutes].
    */
  def followWithinBatch(
      events: DataFrame,
      firstType: String,
      secondType: String,
      gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val f = events.filter(col("event_type") === firstType)
      .select(col("user_id"), col("event_id").as("first_id"),
        usOf(col("ts")).as("first_us"))
    val s = events.filter(col("event_type") === secondType)
      .select(col("user_id"), col("event_id").as("second_id"),
        usOf(col("ts")).as("second_us"))
    f.join(s, Seq("user_id"))
      .filter(col("second_us") >= col("first_us") &&
        col("second_us") <= col("first_us") + gapUs)
      .select(col("user_id"), col("first_id"), col("second_id"))
  }

  /** Streaming form. `first` must carry (user_id, first_id, first_ts),
    * `second` (s_user_id, second_id, second_ts) — stream-stream joins
    * need disjoint column names. Both sides watermarked: first-side
    * state is evictable once the second-side watermark passes
    * first_ts + gap; second-side state once the first-side watermark
    * passes second_ts.
    */
  def followWithinStream(
      first: DataFrame,
      second: DataFrame,
      gapMinutes: Int,
      watermark: String = "10 minutes"): DataFrame = {
    val f = first.withWatermark("first_ts", watermark)
    val s = second.withWatermark("second_ts", watermark)
    f.join(s, expr(
      s"""user_id = s_user_id AND
         |second_ts >= first_ts AND
         |second_ts <= first_ts + INTERVAL $gapMinutes MINUTES""".stripMargin))
      .select(col("user_id"), col("first_id"), col("second_id"))
  }
}
