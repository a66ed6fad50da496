package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.functions.SpaceSaving

/** Per-key tumbling-window heavy hitters on Spark 4's
  * `transformWithState` — the engine's exercise of the NEW
  * arbitrary-state API (named typed state handles + event-time timers,
  * RocksDB-backed), where `StatefulSessionize`/`StreamingNearDup`
  * exercise the classic `flatMapGroupsWithState`.
  *
  * Semantics: every (key, item, ts) row joins the Space-Saving sketch
  * of its OWN event-time window `[floor(ts/W)·W, ·+W)`; a per-window
  * event-time timer fires once the watermark passes the window end and
  * emits that window's top-k (count + error bound per item), then
  * frees exactly that window's state. Late rows inside the watermark
  * land in their correct (still-open) window; state per key is
  * O(open windows × capacity), the bounded-by-construction shape.
  *
  * Scale notes: the sketch keeps per-window memory capped at
  * `capacity` items regardless of item cardinality (the whole point of
  * Space-Saving — see q93's batch twin), and emission is timer-driven,
  * so nothing buffers unboundedly waiting for a "window close" row.
  */
object StreamingTopK {

  final case class ItemIn(key: String, item: String, ts: java.sql.Timestamp)
  final case class TopKOut(key: String, window_end_ms: Long, rank: Int,
      item: String, count: Long, err: Long)

  class Processor(capacity: Int, k: Int, windowMs: Long)
      extends StatefulProcessor[String, ItemIn, TopKOut] {
    private val ss = new SpaceSaving(capacity)
    @transient private var windows: MapState[Long, SpaceSaving.Buf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      windows = getHandle.getMapState[Long, SpaceSaving.Buf](
        "windows", Encoders.scalaLong, Encoders.kryo[SpaceSaving.Buf],
        TTLConfig.NONE)

    private def windowEnd(tsMs: Long): Long =
      (Math.floorDiv(tsMs, windowMs) + 1L) * windowMs

    override def handleInputRows(
        key: String,
        rows: Iterator[ItemIn],
        timerValues: TimerValues): Iterator[TopKOut] = {
      // (ts, item) order so sketch evictions don't depend on partition
      // iteration order
      rows.toSeq.sortBy(r => (r.ts.getTime, r.item)).foreach { r =>
        val we = windowEnd(r.ts.getTime)
        val buf =
          if (windows.containsKey(we)) windows.getValue(we)
          else { getHandle.registerTimer(we); ss.zero }
        windows.updateValue(we, ss.reduce(buf, r.item))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TopKOut] = {
      val we = expiredTimerInfo.getExpiryTimeInMs
      if (!windows.containsKey(we)) return Iterator.empty
      val hits = ss.finish(windows.getValue(we)).take(k)
      windows.removeKey(we)
      hits.zipWithIndex.map { case (h, i) =>
        TopKOut(key, we, i + 1, h.item, h.count, h.err)
      }.iterator
    }
  }

  /** `items` must carry a watermark on `ts` (event-time timers advance
    * with it). Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  def topk(items: Dataset[ItemIn], capacity: Int, k: Int,
      windowMs: Long): Dataset[TopKOut] = {
    import items.sparkSession.implicits._
    items.groupByKey(_.key)
      .transformWithState(new Processor(capacity, k, windowMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
