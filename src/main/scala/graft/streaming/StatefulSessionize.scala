package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming sessionization via
  * `flatMapGroupsWithState` — the arbitrary-state API the engine exposes
  * where windowed aggregation can't express the semantics (dynamic
  * session gaps). Batch twin: `graft.queries.Events.q31`.
  *
  * State per user = the open session; a >30 min event-time gap (or an
  * event-time timeout once the watermark passes last-event + gap) closes
  * it and emits a [[SessionOut]]. State size is O(users), not O(events) —
  * the shape that survives unbounded streams.
  */
object StatefulSessionize {

  val GapMs: Long = 30 * 60 * 1000L

  final case class SessionEvent(user_id: Long, event_id: Long, ts_ms: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, nEvents: Long, sessionIdx: Long)
  final case class SessionOut(user_id: Long, session_idx: Long, n_events: Long, duration_ms: Long)

  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  private[streaming] def process(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator.single(
        SessionOut(userId, s.sessionIdx, s.nEvents, s.lastMs - s.startMs))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts_ms, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_ms - s.lastMs <= GapMs =>
          open = Some(s.copy(lastMs = e.ts_ms, nEvents = s.nEvents + 1))
        case Some(s) =>
          closed += SessionOut(userId, s.sessionIdx, s.nEvents, s.lastMs - s.startMs)
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, s.sessionIdx + 1))
        case None =>
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastMs + GapMs)
    }
    closed.result().iterator
  }
}
