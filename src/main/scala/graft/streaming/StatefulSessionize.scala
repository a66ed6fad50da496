package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming sessionization via
  * `flatMapGroupsWithState` — the arbitrary-state API the engine exposes
  * where windowed aggregation can't express the semantics (dynamic
  * session gaps). Batch twin: `graft.queries.Events.q31`.
  *
  * State per user = the open session plus a monotone session counter.
  * A >30 min event-time gap (or an event-time timeout once the watermark
  * passes last-event + gap) closes the open session and emits a
  * [[SessionOut]]. The counter survives timeouts so (user_id,
  * session_idx) keys never repeat — matching the batch twin's monotone
  * numbering. State size is O(users), not O(events) — the shape that
  * survives unbounded streams.
  */
object StatefulSessionize {

  val GapMs: Long = 30 * 60 * 1000L

  final case class SessionEvent(user_id: Long, event_id: Long, ts_ms: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long, sessionIdx: Long)
  final case class UserState(open: Option[OpenSession], nextIdx: Long)
  final case class SessionOut(user_id: Long, session_idx: Long, n_events: Long, duration_ms: Long)

  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  /** Intermediate-emission row: `is_final=false` rows are per-batch
    * snapshots of a still-open session (same `(user_id, session_idx)`
    * key re-emitted with monotone `n_events` as later batches extend
    * it — downstream upserts by key); `is_final=true` is the session's
    * terminal row (gap-close or event-time timeout), identical to what
    * the append twin emits. */
  final case class SessionSnap(user_id: Long, session_idx: Long,
      n_events: Long, duration_ms: Long, is_final: Boolean)

  /** UPDATE-mode sessionizer — the intermediate-session-emission
    * contract native `session_window` CANNOT express: Spark rejects
    * update mode for session-window streaming aggregations outright
    * (UnsupportedOperationChecker — a merged session cannot be
    * retracted from an agg, pinned in SessionizeUpdateSpec), while
    * arbitrary state emits a keyed snapshot per batch and lets the
    * sink upsert. Same per-event fold as [[sessionize]] (shared
    * [[foldEvents]]), same O(users) state, same timeout close. */
  def sessionizeUpdate(events: Dataset[SessionEvent]): Dataset[SessionSnap] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, SessionSnap](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(processUpdate)
  }

  private def close(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, s.sessionIdx, s.nEvents, s.lastMs - s.startMs)

  /** One batch's event fold: closed sessions out, open session + counter
    * forward. Shared VERBATIM by the append and update forms so the two
    * cannot drift — the append form is under the q267 oracle gate, which
    * transitively pins this fold for both. */
  private[streaming] def foldEvents(
      userId: Long,
      st0: UserState,
      events: Iterator[SessionEvent]): (Seq[SessionOut], UserState) = {
    var open = st0.open
    var nextIdx = st0.nextIdx
    val closed = Seq.newBuilder[SessionOut]
    val sorted = events.toSeq.sortBy(e => (e.ts_ms, e.event_id))
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_ms - s.lastMs <= GapMs =>
          open = Some(s.copy(lastMs = e.ts_ms, nEvents = s.nEvents + 1))
        case other =>
          other.foreach(s => closed += close(userId, s))
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, nextIdx))
          nextIdx += 1
      }
    }
    (closed.result(), UserState(open, nextIdx))
  }

  private[streaming] def process(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[UserState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val st = state.get
      val out = st.open.map(close(userId, _)).toSeq
      // keep the counter (no timeout registered on a counter-only state):
      // a post-timeout event must continue the numbering, not restart at 1
      state.update(UserState(None, st.nextIdx))
      return out.iterator
    }
    val (closed, st) =
      foldEvents(userId, state.getOption.getOrElse(UserState(None, 1L)), events)
    state.update(st)
    st.open.foreach(s => state.setTimeoutTimestamp(s.lastMs + GapMs))
    closed.iterator
  }

  private def snap(userId: Long, s: OpenSession, fin: Boolean): SessionSnap =
    SessionSnap(userId, s.sessionIdx, s.nEvents, s.lastMs - s.startMs, fin)

  private[streaming] def processUpdate(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[UserState]): Iterator[SessionSnap] = {
    if (state.hasTimedOut) {
      val st = state.get
      val out = st.open.map(snap(userId, _, fin = true)).toSeq
      state.update(UserState(None, st.nextIdx))
      return out.iterator
    }
    val (closed, st) =
      foldEvents(userId, state.getOption.getOrElse(UserState(None, 1L)), events)
    state.update(st)
    st.open.foreach(s => state.setTimeoutTimestamp(s.lastMs + GapMs))
    (closed.map(o =>
      SessionSnap(userId, o.session_idx, o.n_events, o.duration_ms, is_final = true))
      ++ st.open.map(snap(userId, _, fin = false))).iterator
  }
}
