package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** [[StatefulSessionize]] re-expressed on Spark 4's `transformWithState`
  * — the successor arbitrary-state API (SPARK-40434 / state-v2): typed
  * per-key [[ValueState]] slots instead of one state blob, and explicit
  * event-time TIMERS instead of `GroupStateTimeout` (register/delete per
  * key; `handleExpiredTimer` fires when the watermark passes the
  * registered instant). Semantics are identical to the fMGWS operator —
  * the spec drives both through the same scenarios — and the batch twin
  * remains `graft.queries.Events.q31`.
  *
  * Why both exist in the library: fMGWS runs on any state store;
  * transformWithState requires the RocksDB provider but gives
  * independent state slots (the session and the monotone counter evolve
  * separately — no whole-blob rewrite to bump a counter), multiple
  * timers per key, and state-schema evolution. New streaming state
  * logic should target this API; the fMGWS operator stays as the
  * HDFS-backed fallback.
  *
  * State per user: `open` (the open session, absent when none) and
  * `nextIdx` (monotone counter that SURVIVES session closes, so
  * (user_id, session_idx) never repeats). Exactly one timer per key is
  * live: the open session's `lastMs + gap` deadline, re-registered when
  * events extend the session. State is O(users); timers are O(users).
  */
object TwsSessionize {

  import StatefulSessionize.{GapMs, OpenSession, SessionEvent, SessionOut}

  /** RocksDB is a hard requirement of transformWithState; the spec (and
    * any production caller) sets this provider for the query's session.
    */
  val RequiredProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  class SessionProcessor
      extends StatefulProcessor[Long, SessionEvent, SessionOut] {

    @transient private var open: ValueState[OpenSession] = _
    @transient private var nextIdx: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)
      nextIdx = getHandle.getValueState[Long](
        "nextIdx", Encoders.scalaLong, TTLConfig.NONE)
    }

    private def closed(userId: Long, s: OpenSession): SessionOut =
      SessionOut(userId, s.sessionIdx, s.nEvents, s.lastMs - s.startMs)

    override def handleInputRows(
        userId: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      var cur = if (open.exists()) Option(open.get()) else None
      var idx = if (nextIdx.exists()) nextIdx.get() else 1L
      // the only live timer is the open session's deadline from the
      // previous batch — tracked so extension re-registers exactly once
      val prevTimer = cur.map(_.lastMs + GapMs)
      val out = Seq.newBuilder[SessionOut]
      // same total order as the fMGWS operator: (ts, event_id)
      rows.toSeq.sortBy(e => (e.ts_ms, e.event_id)).foreach { e =>
        cur match {
          case Some(s) if e.ts_ms - s.lastMs <= GapMs =>
            // assign, don't max: the fMGWS twin regresses lastMs on a
            // cross-batch late event (within gap, above watermark) and
            // the parity contract says these APIs emit identical rows
            cur = Some(s.copy(lastMs = e.ts_ms, nEvents = s.nEvents + 1))
          case other =>
            other.foreach(s => out += closed(userId, s))
            cur = Some(OpenSession(e.ts_ms, e.ts_ms, 1L, idx))
            idx += 1
        }
      }
      val newTimer = cur.map(_.lastMs + GapMs)
      if (prevTimer != newTimer) {
        prevTimer.foreach(getHandle.deleteTimer)
        newTimer.foreach(getHandle.registerTimer)
      }
      nextIdx.update(idx)
      cur match {
        case Some(s) => open.update(s)
        case None => open.clear()
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // a deleted timer never fires, but guard on the deadline anyway —
      // only the CURRENT open session's own timer may close it
      if (open.exists()) {
        val s = open.get()
        if (s.lastMs + GapMs <= expiredTimerInfo.getExpiryTimeInMs) {
          open.clear() // counter state survives — numbering continues
          return Iterator.single(closed(userId, s))
        }
      }
      Iterator.empty
    }
  }

  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
