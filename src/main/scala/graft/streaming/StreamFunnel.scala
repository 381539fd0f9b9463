package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.funnel]]: per-user
  * first-touch funnel progression maintained as ingest-time state instead
  * of a batch recomputation — the live conversion dashboard shape.
  *
  * Semantics: a user advances from stage k to k+1 on the FIRST stage-(k+1)
  * event strictly after their stage-k anchor, exactly the batch operator's
  * earliest-qualifying-event rule. Processing events in event-time order
  * makes the greedy in-order scan equal the batch min-anchoring
  * (spec-asserted streaming ≡ batch across micro-batch boundaries);
  * within each micro-batch the group's rows are sorted by event time, so
  * in-batch disorder is immaterial. A stage event arriving in a LATER
  * batch than a same-user later-stage event (cross-batch disorder) is the
  * documented divergence — the same replay-order caveat every stateful
  * twin here carries.
  *
  * Output: one append row per stage TRANSITION `(user_id, stage_idx,
  * stage, ts_us)` — the per-stage user counts of the batch report are a
  * trivial downstream aggregation of these transitions.
  *
  * 100 TB/state posture: state is THREE longs per user (current stage,
  * anchor micros, last-seen micros) — O(1) per user, independent of
  * event rate. Completed users (final stage reached) drop their state
  * immediately; in-progress funnels idle past `idleTimeout` of event
  * time are EVICTED by the watermark (the [[Sessionize]] /
  * [[StreamingNearDup]] contract — state must never grow with
  * ever-seen-user cardinality unboundedly). An evicted user who returns
  * starts the funnel over from stage 1 — documented restart semantics,
  * the price of bounded state. The SAME restart applies to COMPLETED
  * users: reaching the final stage removes state immediately, so a
  * returning completed user silently begins a fresh funnel at stage 1
  * and re-emits stage transitions. Downstream per-stage counts therefore
  * match [[graft.operators.Behavior.funnel]] only when aggregated as
  * `count(DISTINCT user_id)` per stage — never a raw transition count,
  * which double-counts restarted users (restart-after-eviction and
  * restart-after-completion alike).
  */
object StreamFunnel {

  final case class FunnelEvent(
      user_id: Long, ts: java.sql.Timestamp, event_type: String)

  final case class FunnelState(stage: Int, anchor_us: Long, last_us: Long)

  final case class StageReached(
      user_id: Long, stage_idx: Int, stage: String, ts_us: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  def stageTransitions(
      events: Dataset[FunnelEvent],
      stages: Seq[String] = Seq("view", "click", "purchase"),
      idleTimeoutMinutes: Int = 43200 /* 30 days */): Dataset[StageReached] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(idleTimeoutMinutes > 0, "idleTimeoutMinutes must be positive")
    import events.sparkSession.implicits._
    val idleMillis = idleTimeoutMinutes * 60000L

    def update(
        userId: Long,
        rows: Iterator[FunnelEvent],
        state: GroupState[FunnelState]): Iterator[StageReached] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val out = scala.collection.mutable.ArrayBuffer[StageReached]()
      var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue, 0L))
      // event-time order within the batch: the greedy scan then anchors
      // each stage at its earliest qualifying event, like the batch twin
      rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
        st = st.copy(last_us = math.max(st.last_us, micros(e.ts)))
        if (st.stage < stages.length &&
          e.event_type == stages(st.stage) &&
          (st.stage == 0 || micros(e.ts) > st.anchor_us)) {
          st = st.copy(stage = st.stage + 1, anchor_us = micros(e.ts))
          out += StageReached(userId, st.stage, stages(st.stage - 1),
            st.anchor_us)
        }
      }
      if (st.stage >= stages.length) state.remove() // funnel complete
      else if (st.stage > 0 || state.exists) {
        state.update(st)
        // watermark-driven eviction; clamp past the current watermark so
        // a stale last-seen can only evict early, never kill the query
        // (the Sessionize lesson)
        val wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
          math.max(st.last_us / 1000L + idleMillis, wm + 1))
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
