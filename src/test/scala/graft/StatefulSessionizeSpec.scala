package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.{SessionEvent, SessionOut}

/** flatMapGroupsWithState sessionization driven deterministically
  * through MemoryStream.
  */
class StatefulSessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1700000000000L // fixed epoch-ms origin
  private def m(min: Long): Long = T0 + min * 60000L

  test("gap closes a session; state emits it with correct stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // event-time timeout requires a watermark over an event-time column
    val withTime = input.toDS()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as[SessionEvent]
    val out = StatefulSessionize.sessionize(withTime)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()

    // user 1: three events 5 min apart (one session), then a 60-min gap
    input.addData(
      SessionEvent(1, 1, m(0)), SessionEvent(1, 2, m(5)), SessionEvent(1, 3, m(10)),
      SessionEvent(2, 4, m(0)))
    q.processAllAvailable()
    // next batch: the gap event closes user 1's first session inline
    input.addData(SessionEvent(1, 5, m(70)), SessionEvent(2, 6, m(80)))
    q.processAllAvailable()
    // advance watermark far enough that open sessions time out
    input.addData(SessionEvent(99, 7, m(500)))
    q.processAllAvailable()
    input.addData(SessionEvent(99, 8, m(900)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions_out").as[SessionOut].collect()
      .map(s => (s.user_id, s.session_idx, s.n_events, s.duration_ms)).toSet
    // user 1 session 1: events at 0,5,10 → 3 events, 10 min
    assert(rows.contains((1L, 1L, 3L, 600000L)), rows.toString)
    // user 2 session 1: single event, closed by gap at m(80)
    assert(rows.contains((2L, 1L, 1L, 0L)), rows.toString)
    // user 1 session 2 (single event at m(70)) closed by event-time timeout
    assert(rows.contains((1L, 2L, 1L, 0L)), rows.toString)
  }

  test("session numbering survives a timeout (no duplicate keys)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val withTime = input.toDS()
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .as[SessionEvent]
    val q = StatefulSessionize.sessionize(withTime)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out2").start()

    input.addData(SessionEvent(5, 1, m(0)))
    q.processAllAvailable()
    input.addData(SessionEvent(99, 2, m(100))) // advance watermark
    q.processAllAvailable()
    input.addData(SessionEvent(99, 3, m(150))) // timeout fires for user 5
    q.processAllAvailable()
    input.addData(SessionEvent(5, 4, m(200)))  // post-timeout session
    q.processAllAvailable()
    input.addData(SessionEvent(99, 5, m(700)))
    q.processAllAvailable()
    input.addData(SessionEvent(99, 6, m(800))) // second timeout for user 5
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions_out2").as[SessionOut].collect()
    val u5 = rows.filter(_.user_id == 5).map(s => (s.session_idx, s.n_events)).toSet
    // the post-timeout session must be idx 2, never a duplicate idx 1
    assert(u5 == Set((1L, 1L), (2L, 1L)), rows.mkString(", "))
    val keys = rows.map(s => (s.user_id, s.session_idx)).toSeq
    assert(keys.distinct.size == keys.size, s"duplicate keys in $keys")
  }
}
