package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.linearAttribution]]: the
  * live marketing-credit feed — per-user touch history maintained as
  * ingest-time state; each conversion emits one credit row per touch in
  * its lookback window at the moment it lands, on the same integer ppm
  * lattice as the batch operator.
  *
  * Semantics (the batch contract, incrementalized): a conversion at t
  * credits every same-user touch with `touch_us <= t` and
  * `touch_us > t − window`, each earning `1000000 div n_touches`. Under
  * event-time-ordered replay the emitted credits aggregate EXACTLY to the
  * batch report (spec-asserted across micro-batch boundaries; within a
  * batch rows are sorted by (event time, touches-before-conversions) so
  * same-micros touches count, like the batch `<=`). A touch arriving in a
  * later batch than a same-user conversion it should have credited is the
  * documented cross-batch-disorder divergence every stateful twin here
  * carries. A touch can credit MULTIPLE conversions (batch parity —
  * state is pruned by the window, never cleared by a conversion).
  *
  * 100 TB/state posture: state per user is the touch list inside ONE
  * lookback window, hard-capped at `maxTouches` (oldest dropped first —
  * a cap hit means that user's n_touches is already ≥ cap, where
  * per-touch credit is ≤ 1e6/cap ppm; the documented truncation). Every
  * event prunes touches at or before `ts − window`, so state never
  * grows with stream length; idle users are evicted wholesale by the
  * watermark timeout ([[StreamFunnel]] contract). Eviction restarts a
  * returning user with an empty touch history — conversions right after
  * restart under-credit, the price of bounded state.
  */
object StreamAttribution {

  final case class AttribEvent(
      event_id: Long, user_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  final case class Touch(channel: String, ts_us: Long)

  final case class AttribState(touches: Seq[Touch], last_us: Long)

  final case class Credit(
      user_id: Long, conv_id: Long, conv_us: Long, channel: String,
      touch_us: Long, n_touches: Long, credit_ppm: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  def credits(
      events: Dataset[AttribEvent],
      touchTypes: Seq[String] = Seq("view", "click"),
      convType: String = "purchase",
      windowHours: Int = 24,
      maxTouches: Int = 256,
      idleTimeoutMinutes: Int = 43200 /* 30 days */): Dataset[Credit] = {
    require(touchTypes.nonEmpty && windowHours > 0 && maxTouches > 0)
    require(idleTimeoutMinutes > 0)
    require(!touchTypes.contains(convType),
      "convType must not be a touch type (the touch branch would shadow " +
        "conversions and silently diverge from the batch twin)")
    import events.sparkSession.implicits._
    val winUs = windowHours.toLong * 3600000000L
    val idleMillis = idleTimeoutMinutes * 60000L
    val touchSet = touchTypes.toSet

    def update(
        userId: Long,
        rows: Iterator[AttribEvent],
        state: GroupState[AttribState]): Iterator[Credit] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = scala.collection.mutable.ArrayBuffer[Credit]()
      var st = state.getOption.getOrElse(AttribState(Vector.empty, 0L))
      var touches = st.touches.toVector
      // (ts, kind) sort: same-micros touches precede conversions, so the
      // batch twin's touch_us <= conv_us (inclusive) is reproduced
      val ordered = rows.toSeq.sortBy { e =>
        (micros(e.ts), if (touchSet(e.event_type)) 0 else 1)
      }
      var lastUs = st.last_us
      ordered.foreach { e =>
        val us = micros(e.ts)
        lastUs = math.max(lastUs, us)
        // prune: a touch at or before us − window can never be credited
        // by this or any later (ordered-replay) conversion
        if (touches.nonEmpty)
          touches = touches.filter(_.ts_us > us - winUs)
        if (touchSet(e.event_type)) {
          touches = touches :+ Touch(e.event_type, us)
          if (touches.length > maxTouches)
            touches = touches.drop(touches.length - maxTouches)
        } else if (e.event_type == convType) {
          // retained touches are exactly the window (> us−win by the
          // prune, <= us by ordered replay + the same-micros sort)
          val n = touches.length.toLong
          if (n > 0L) {
            val credit = 1000000L / n
            touches.foreach { t =>
              out += Credit(userId, e.event_id, us, t.channel, t.ts_us,
                n, credit)
            }
          }
        }
      }
      if (touches.nonEmpty || state.exists) {
        state.update(AttribState(touches, lastUs))
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
          math.max(lastUs / 1000L + idleMillis, wm + 1))
      }
      out.iterator
    }

    events
      .withWatermark("ts", s"$idleTimeoutMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
