package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of the q181 last-touch attributor
  * ([[graft.queries.EventStats.q181]]): purchases are attributed to the
  * SAME user's most recent preceding click within
  * [[StreamingAttribution.AttrWindowMs]] — but online, as the events
  * land, instead of over the settled log.
  *
  * `transformWithState` (the state-v2 API, per [[TwsSessionize]]'s
  * rationale) with ONE [[ValueState]] slot per user: the latest click's
  * (id, event-time). A purchase reads the slot and emits its verdict
  * immediately; a click overwrites the slot and re-registers the key's
  * single event-time timer at click + window, whose expiry CLEARS the
  * slot — expired clicks can never attribute, so per-key state is one
  * row and dies with the attribution window. That timer is exactly the
  * reference DLQ pattern inverted: instead of redriving, stale state is
  * condemned when the watermark passes its deadline.
  *
  * Parity contract with the batch twin (pinned by
  * [[graft.StreamingAttributionSpec]]): for in-order streams, every
  * ATTRIBUTED purchase matches q181's `attributed = 1` rows bit-for-bit
  * (same click id, same gap). Event times are carried in MICROSECONDS —
  * the same resolution the batch window orders by — so same-millisecond
  * click/purchase pairs sort identically in both twins (a ms-truncated
  * operator would process a later-µs click first and flip the verdict);
  * only the watermark/timer plumbing rounds to Spark's ms clock.
  * Unattributed purchases differ in one documented way: the batch
  * query — holding the full log — still reports the stale click's id
  * and gap, while the streaming operator has (correctly) expired that
  * state and reports click_id = -1. The bounded-state trade erases only
  * information the attribution verdict never uses.
  *
  * Scale shape: state is O(active users) × one (long, long) pair, with
  * event-time TTL via the timer; per-batch work is one shuffle on
  * user_id. No corpus-sized state, no unbounded growth on a user who
  * never purchases.
  */
object StreamingAttribution {

  /** Attribution window: a click older than this cannot convert. */
  val AttrWindowMs: Long = 30L * 60L * 1000L

  /** The window in µs — verdict math runs at batch resolution. */
  val AttrWindowUs: Long = AttrWindowMs * 1000L

  case class AttrEvent(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String)

  /** `click_id = -1` ⇔ no live click in the window. */
  case class AttrOut(user_id: Long, purchase_id: Long, click_id: Long,
      gap_us: Long, attributed: Boolean)

  /** Public (not `private`) so the generated state-encoder projections
    * can reach it — a private member makes Janino's SafeProjection fail
    * to compile and Spark silently interprets every state (de)serialize
    * per row ([[graft.StreamingAttributionSpec]] scrapes the log for the
    * fallback so this can't regress quietly). */
  case class LastClick(click_id: Long, click_us: Long)

  /** A click's expiry instant on Spark's ms timer clock: the first
    * whole millisecond at-or-after the exact µs deadline (ceil — the
    * timer must never fire while the µs window is still open). */
  private def deadlineMs(clickUs: Long): Long =
    (clickUs + AttrWindowUs + 999L) / 1000L

  class AttributionProcessor
      extends StatefulProcessor[Long, AttrEvent, AttrOut] {

    @transient private var lastClick: ValueState[LastClick] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastClick = getHandle.getValueState[LastClick](
        "lastClick", Encoders.product[LastClick], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long,
        rows: Iterator[AttrEvent],
        timerValues: TimerValues): Iterator[AttrOut] = {
      var cur = if (lastClick.exists()) Option(lastClick.get()) else None
      val prevTimer = cur.map(c => deadlineMs(c.click_us))
      // a click whose deadline the watermark has already passed is dead
      // even though its timer fires only AFTER this batch's input rows —
      // expire it here so batch-order cannot resurrect stale state
      cur = cur.filter(c => deadlineMs(c.click_us) >
        timerValues.getCurrentWatermarkInMs())
      val out = Seq.newBuilder[AttrOut]
      // same total order as the batch twin's window: (ts µs, event_id)
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        e.event_type match {
          case "click" =>
            cur = Some(LastClick(e.event_id, e.ts_us))
          case "purchase" =>
            out += (cur match {
              case Some(c) =>
                val gap = e.ts_us - c.click_us
                AttrOut(userId, e.event_id, c.click_id, gap,
                  attributed = gap >= 0 && gap <= AttrWindowUs)
              case None =>
                AttrOut(userId, e.event_id, -1L, -1L, attributed = false)
            })
          case _ => // view/signup/error neither click nor convert
        }
      }
      val newTimer = cur.map(c => deadlineMs(c.click_us))
      if (prevTimer != newTimer) {
        prevTimer.foreach(getHandle.deleteTimer)
        newTimer.foreach(getHandle.registerTimer)
      }
      cur match {
        case Some(c) => lastClick.update(c)
        case None => lastClick.clear()
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AttrOut] = {
      // only the CURRENT click's own deadline may clear it — a newer
      // click deleted the old timer, but guard on the instant anyway
      if (lastClick.exists() &&
          deadlineMs(lastClick.get().click_us) <=
            expiredTimerInfo.getExpiryTimeInMs) {
        lastClick.clear()
      }
      Iterator.empty
    }
  }

  def attribute(events: Dataset[AttrEvent]): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new AttributionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
