package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StatefulSessionize, TwsSessionize}
import graft.streaming.StatefulSessionize.{SessionEvent, SessionOut}

/** transformWithState sessionization driven through MemoryStream — the
  * SAME scenarios as StatefulSessionizeSpec, so the two arbitrary-state
  * APIs are pinned to identical semantics (plus the state-v2-only
  * check that timer re-registration follows session extension).
  */
class TwsSessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val T0 = 1700000000000L
  private def m(min: Long): Long = T0 + min * 60000L

  /** transformWithState hard-requires the RocksDB state store; scope
    * the provider override to the query like the streaming specs scope
    * their confs (never leave session-wide side effects). */
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

  test("gap closes a session; timers close the rest; numbering survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[SessionEvent]
      val withTime = input.toDS()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "0 seconds")
        .as[SessionEvent]
      val q = TwsSessionize.sessionize(withTime)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_sessions").start()

      input.addData(
        SessionEvent(1, 1, m(0)), SessionEvent(1, 2, m(5)),
        SessionEvent(1, 3, m(10)), SessionEvent(2, 4, m(0)))
      q.processAllAvailable()
      // the gap event closes user 1's first session inline; user 2's
      // single event times out once the watermark passes m(80)+gap
      input.addData(SessionEvent(1, 5, m(70)), SessionEvent(2, 6, m(80)))
      q.processAllAvailable()
      input.addData(SessionEvent(99, 7, m(500)))
      q.processAllAvailable()
      input.addData(SessionEvent(99, 8, m(900)))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("tws_sessions").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_idx, s.n_events, s.duration_ms)).toSet
      assert(rows.contains((1L, 1L, 3L, 600000L)), rows.toString)
      assert(rows.contains((2L, 1L, 1L, 0L)), rows.toString)
      // user 1 session 2 closed by TIMER (watermark passed m(70)+gap) —
      // and numbered 2, proving the counter survived the first close
      assert(rows.contains((1L, 2L, 1L, 0L)), rows.toString)
      // user 2's second session (m(80)) also timer-closed, numbered 2
      assert(rows.contains((2L, 2L, 1L, 0L)), rows.toString)
    }
  }

  test("session extension re-registers the timer (no premature close)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[SessionEvent]
      val withTime = input.toDS()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "0 seconds")
        .as[SessionEvent]
      val q = TwsSessionize.sessionize(withTime)
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_sessions2").start()

      // keep extending user 7's session in 20-min steps: each batch's
      // watermark passes the PREVIOUS deadline-minus-extension, so if
      // extension failed to move the timer the session would close early
      input.addData(SessionEvent(7, 1, m(0)))
      q.processAllAvailable()
      input.addData(SessionEvent(7, 2, m(20)))
      q.processAllAvailable()
      input.addData(SessionEvent(7, 3, m(40)))
      q.processAllAvailable()
      val open = spark.table("tws_sessions2").as[SessionOut].collect()
      assert(!open.exists(_.user_id == 7L),
        s"session closed prematurely: ${open.mkString(",")}")
      // now jump the watermark far ahead: exactly ONE session, 3 events
      input.addData(SessionEvent(99, 4, m(500)))
      q.processAllAvailable()
      input.addData(SessionEvent(99, 5, m(900)))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("tws_sessions2").as[SessionOut].collect()
        .filter(_.user_id == 7L)
        .map(s => (s.session_idx, s.n_events, s.duration_ms)).toSet
      assert(rows == Set((1L, 3L, 2400000L)), rows.toString)
    }
  }

  test("cross-batch late events (within gap, above watermark) keep the APIs in parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1 ends at m(20); batch 2 delivers a LATE event at m(10) —
    // watermark (delay 30 min) is still behind it, so both APIs must
    // process it, regress lastMs, and report the same duration
    def run(name: String,
        f: org.apache.spark.sql.Dataset[SessionEvent] =>
           org.apache.spark.sql.Dataset[SessionOut]): Set[(Long, Long, Long, Long)] = {
      val input = MemoryStream[SessionEvent]
      val withTime = input.toDS()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "30 minutes")
        .as[SessionEvent]
      val q = f(withTime).writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      input.addData(SessionEvent(3, 1, m(0)), SessionEvent(3, 2, m(20)))
      q.processAllAvailable()
      input.addData(SessionEvent(3, 3, m(10))) // late, within gap
      q.processAllAvailable()
      input.addData(SessionEvent(99, 4, m(500)))
      q.processAllAvailable()
      input.addData(SessionEvent(99, 5, m(1000)))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[SessionOut].collect().filter(_.user_id == 3L)
        .map(s => (s.user_id, s.session_idx, s.n_events, s.duration_ms)).toSet
    }
    val tws = withRocksDb(run("tws_late", TwsSessionize.sessionize))
    val fmgws = run("fmgws_late", StatefulSessionize.sessionize)
    assert(tws == fmgws, s"late-event divergence: tws=$tws fmgws=$fmgws")
    assert(tws.nonEmpty)
  }

  test("tws and fMGWS sessionizers agree on a mixed randomized scenario") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic pseudo-random batches over 5 users
    val rnd = new scala.util.Random(1234)
    var t = 0L
    val batches = (1 to 4).map { _ =>
      (1 to 12).map { i =>
        t += rnd.nextInt(25) // minutes forward, may cross the 30-min gap
        SessionEvent(1 + rnd.nextInt(5), t * 1000 + i, m(t))
      }
    }
    def run(name: String,
        f: org.apache.spark.sql.Dataset[SessionEvent] =>
           org.apache.spark.sql.Dataset[SessionOut]): Set[(Long, Long, Long, Long)] = {
      val input = MemoryStream[SessionEvent]
      val withTime = input.toDS()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "0 seconds")
        .as[SessionEvent]
      val q = f(withTime).writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // flush every open session with a late sentinel watermark jump
      input.addData(SessionEvent(999, 1, m(t + 10000)))
      q.processAllAvailable()
      input.addData(SessionEvent(999, 2, m(t + 20000)))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[SessionOut].collect()
        .filter(_.user_id <= 5)
        .map(s => (s.user_id, s.session_idx, s.n_events, s.duration_ms)).toSet
    }
    val tws = withRocksDb(run("tws_mixed", TwsSessionize.sessionize))
    val fmgws = run("fmgws_mixed", StatefulSessionize.sessionize)
    assert(tws == fmgws,
      s"APIs disagree:\nonly tws: ${tws -- fmgws}\nonly fmgws: ${fmgws -- tws}")
    assert(tws.nonEmpty)
  }
}
