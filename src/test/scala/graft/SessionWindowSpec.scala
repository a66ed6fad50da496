package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Events

/** q265 native `session_window` (VERDICT r14 item 6): pins the exact
  * gap-boundary semantics the oracle must mirror, cross-checks the
  * batch query against an independent driver-side sessionization model
  * at sf0.001, and soaks the streaming twin (watermark + append) for
  * bounded session state and batch-twin equality.
  */
class SessionWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def sessionize(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
    .agg(count(lit(1)).as("n_events"))
    .select(col("user_id"),
      unix_micros(col("session_window.start")).as("session_start_us"),
      unix_micros(col("session_window.end")).as("session_end_us"),
      col("n_events"))

  test("exact 30-min gap MERGES (windows overlap-or-touch, `ts <= end`) " +
    "— session_window agrees with q31's `diff > gap` rule at the boundary") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:29:59")), // 29:59 < 30:00 → merges
      (1L, ts("2024-01-01 10:59:59")), // EXACTLY 30:00 after the last → MERGES (inclusive)
      (1L, ts("2024-01-01 11:30:00")) // 30:01 after the last → NEW session
    ).toDF("user_id", "ts")
    val out = sessionize(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val us = (s: String) => Timestamp.valueOf(s).getTime * 1000L
    assert(out == Set(
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 11:29:59"), 3L),
      (1L, us("2024-01-01 11:30:00"), us("2024-01-01 12:00:00"), 1L)),
      s"gap-boundary sessions wrong (oracle assumes exact-gap merges): $out")
  }

  test("q265 batch matches an independent driver-side sessionization " +
    "model on sf0.001 events") {
    val dir = "/root/testdata/sf0.001"
    val got = Events.q265(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    val gapUs = 1800L * 1000000L
    val events = Tables.table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._1).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.map(e => (e._2, e._3)).sorted
      val sessions = mutable.ArrayBuffer.empty[(Long, Long, Long)] // start,last,n
      sorted.foreach { case (us, _) =>
        // <=, not <: an event at exactly last+gap merges (the
        // inclusive boundary the fixture test pins)
        if (sessions.nonEmpty && us - sessions.last._2 <= gapUs) {
          val (s, _, n) = sessions.remove(sessions.size - 1)
          sessions += ((s, us, n + 1))
        } else sessions += ((us, us, 1L))
      }
      sessions.map { case (s, last, n) => (uid, s, last + gapUs, n) }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected,
      s"batch vs model diverged: got ${got.size} sessions, " +
        s"expected ${expected.size}; first diff ${
          got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.nonEmpty && got.exists(_._4 > 1),
      "fixture must exercise multi-event sessions")
  }

  test("streaming session_window soak: 60 batches, state plateaus at the " +
    "open-session horizon, emitted sessions equal the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()

    // 3 users, each bursting 2 events (5 min apart) every 3rd batch;
    // event time advances 20 min per batch, so per-user bursts are
    // 60 min apart → every burst is its own session, closing ~2-3
    // batches after it opens (end = burst start + 35 min, watermark
    // trails 10 min). An unbounded-state bug would grow the store by
    // one session per batch forever; correct eviction plateaus at the
    // few still-open sessions.
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val batches = 60
    val fed = mutable.ArrayBuffer.empty[(Long, Timestamp)]
    val stateRows = mutable.ArrayBuffer.empty[Long]
    for (b <- 0 until batches) {
      val u = (b % 3).toLong
      val base = t0 + b.toLong * 20L * 60000L
      val burst = Seq((u, new Timestamp(base)),
        (u, new Timestamp(base + 5L * 60000L)))
      fed ++= burst
      input.addData(burst: _*)
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows += p.stateOperators(0).numRowsTotal
    }
    // flush: far-future events (distinct user 99) close every burst
    // session. TWO steps, because eviction in batch N uses the
    // watermark computed at the END of batch N-1 — a single flush
    // batch advances the watermark but cannot emit under it yet. The
    // second flush also closes the FIRST flush session (asserted
    // below); only the second flush's own session stays open at stop.
    input.addData((99L, new Timestamp(t0 + 10000L * 60000L)))
    q.processAllAvailable()
    input.addData((99L, new Timestamp(t0 + 20000L * 60000L)))
    q.processAllAvailable()
    q.stop()

    val allEmitted = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(allEmitted.count(_._1 == 99L) == 1,
      "flush user: first session closed by the second flush, second " +
        s"still open in append mode: ${allEmitted.filter(_._1 == 99L)}")
    val emitted = allEmitted.filterNot(_._1 == 99L)
    val expected = sessionize(fed.toSeq.toDF("user_id", "ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(emitted == expected,
      s"stream/batch diverged: ${emitted.size} streamed vs ${expected.size} " +
        s"batch; missing ${(expected -- emitted).take(3)}; " +
        s"extra ${(emitted -- expected).take(3)}")
    assert(expected.size == batches && expected.forall(_._4 == 2L),
      s"workload shape: every burst one 2-event session (${expected.size})")
    // plateau: open sessions are bounded by the eviction horizon, and
    // the second half of the soak must not trend above the first
    assert(stateRows.nonEmpty && stateRows.max <= 8,
      s"session state must stay bounded, saw max ${stateRows.max}")
    val half = stateRows.size / 2
    assert(stateRows.drop(half).max <= stateRows.take(half).max + 1,
      s"state grew across the soak: ${stateRows.take(half).max} -> " +
        s"${stateRows.drop(half).max}")
  }
}
