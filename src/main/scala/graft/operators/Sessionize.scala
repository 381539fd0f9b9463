package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over the events stream — the canonical
  * stateful operator for behavioral / training-data pipelines (not present
  * in the reference, which is stateless per-message — SURVEY.md §2D; the
  * streaming form is the `mapGroupsWithState` exemplar mandated by the
  * project brief).
  *
  * Batch form: two windows over (user, time) — `lag` marks gap breaks, a
  * running sum of breaks numbers the sessions; one shuffle on user_id, no
  * state. Exactly SQL-expressible, so it carries a DuckDB oracle.
  *
  * Streaming form: `flatMapGroupsWithState` with event-time timeout — one
  * state entry per live session per user; sessions close when the
  * watermark passes start-of-gap. State size is O(active users), the
  * property that matters on an unbounded stream.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Int)

  /** Batch sessionization: session boundaries where the gap to the previous
    * event exceeds `gapMinutes`; session_id = running count of boundaries.
    */
  def batchSessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val gapSec = gapMinutes * 60L
    events
      .select(col("user_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapSec * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_break")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Streaming sessionization with event-time state timeout. Emits a
    * session when no event arrives within the gap (watermark-driven).
    */
  def streamingSessions(
      events: Dataset[Event],
      gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(
        userId: Long,
        rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer[Session]()
      if (state.hasTimedOut) {
        val s = state.get
        out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              // a late-but-within-watermark event may precede the stored
              // session start — extend both bounds
              cur = Some(s.copy(start = math.min(s.start, t),
                last = math.max(s.last, t), n = s.n + 1))
            case Some(s) =>
              out += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // setTimeoutTimestamp THROWS on a timeout at/behind the current
          // watermark. Spark's late-row filter normally guarantees
          // last+gap > watermark (rows behind the watermark never reach
          // this operator), but that invariant lives outside this
          // function — clamp to watermark+1 so a stale `last` can only
          // ever close the session early, never kill the query
          val wm = state.getCurrentWatermarkMs()
          state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
