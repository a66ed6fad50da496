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

  private def close(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, s.sessionIdx, s.nEvents, s.lastMs - s.startMs)

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
    val st0 = state.getOption.getOrElse(UserState(None, 1L))
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
    state.update(UserState(open, nextIdx))
    open.foreach(s => state.setTimeoutTimestamp(s.lastMs + GapMs))
    closed.result().iterator
  }
}
