package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingAttribution, TwsSessionize}
import graft.streaming.StreamingAttribution.{AttrEvent, AttrOut, AttrWindowMs}

/** Last-touch attribution through transformWithState: verdict parity
  * with the batch twin (EventStats.q181), click replacement, and the
  * event-time TTL that forgets expired clicks.
  */
class StreamingAttributionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1700000000000L
  private def m(min: Long): Long = T0 + min * 60000L

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, TwsSessionize.RequiredProvider)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** feed gets the input stream and a step() that drains a micro-batch
    * (so scenarios can advance the watermark between batches). */
  private def run(name: String)(feed: (MemoryStream[AttrEvent], () => Unit) => Unit): Set[AttrOut] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[AttrEvent]
      val withTime = input.toDS()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "0 seconds")
        .as[AttrEvent]
      val q = StreamingAttribution.attribute(withTime)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try { feed(input, () => q.processAllAvailable()); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).as[AttrOut].collect().toSet
    }
  }

  test("in-window purchases attribute to the latest click; one click converts many") {
    val rows = run("attr_basic") { (input, _) =>
      input.addData(
        AttrEvent(1, 10, m(0), "click"),
        AttrEvent(1, 11, m(2), "click"), // replaces click 10
        AttrEvent(1, 12, m(5), "view"), // non-touch, ignored
        AttrEvent(1, 13, m(10), "purchase"),
        AttrEvent(1, 14, m(20), "purchase"), // same click, again
        AttrEvent(2, 20, m(1), "purchase")) // no click at all
    }
    assert(rows == Set(
      AttrOut(1, 13, 11, 8 * 60000L, attributed = true),
      AttrOut(1, 14, 11, 18 * 60000L, attributed = true),
      AttrOut(2, 20, -1, -1, attributed = false)), rows.toString)
  }

  test("stale click in live state yields gap but no attribution; expired state forgets it") {
    val rows = run("attr_ttl") { (input, step) =>
      // batch 1: the 40-min-later purchase still SEES the click
      // (nothing expired mid-batch) but the gap fails the window
      input.addData(
        AttrEvent(1, 10, m(0), "click"),
        AttrEvent(1, 11, m(40), "purchase"))
      step()
      // watermark after batch 1 is m(40) > m(0)+30min → the state is
      // expired before batch 2's rows: the next purchase reports -1
      input.addData(AttrEvent(1, 12, m(50), "purchase"))
    }
    assert(rows == Set(
      AttrOut(1, 11, 10, 40 * 60000L, attributed = false),
      AttrOut(1, 12, -1, -1, attributed = false)), rows.toString)
  }

  test("verdict parity with batch q181 on the sf0.001 events table") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.table(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) DIV 1000").as("ts_ms"), col("event_type"))
      .as[AttrEvent].collect().toSeq
    val streamed = run("attr_parity")((in, _) => in.addData(events))
      .map(o => o.purchase_id -> o).toMap

    val batch = graft.queries.EventStats.q181(spark, sfDir).collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val pid = r.getLong(r.fieldIndex("purchase_id"))
      val o = streamed(pid)
      val batchClick =
        if (r.isNullAt(r.fieldIndex("click_id"))) -1L
        else r.getLong(r.fieldIndex("click_id"))
      assert(o.click_id == batchClick, s"purchase $pid click")
      val batchAttributed = r.getLong(r.fieldIndex("attributed")) == 1L
      assert(o.attributed == batchAttributed, s"purchase $pid verdict")
      if (batchClick >= 0) {
        // stream times are ms-truncated µs: the two floors differ by
        // at most one ms from the batch's exact µs gap
        val gapUs = r.getLong(r.fieldIndex("gap_us"))
        assert(math.abs(o.gap_ms - gapUs / 1000L) <= 1L,
          s"purchase $pid gap ${o.gap_ms} vs $gapUs µs")
      }
    }
    assert(streamed.size == batch.length)
  }

  test("window constant matches the batch twin's 30 minutes") {
    assert(AttrWindowMs == 30L * 60L * 1000L)
  }
}
