package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessionize
import graft.streaming.StatefulSessionize.{SessionEvent, SessionSnap}

/** UPDATE-mode sessionization (VERDICT r15 item 7, second arm): pins
  * the intermediate-session-emission semantics the append twin
  * (q267 / SessionWindowSpec) cannot show.
  *
  *  1. Native `session_window` REJECTS update mode — Spark's
  *     UnsupportedOperationChecker throws at `start()` because a merged
  *     session can't be retracted from a streaming agg. Pinned so a
  *     future Spark version silently enabling it (and changing the
  *     engine's reachable surface) fails a test, not a user.
  *  2. `StatefulSessionize.sessionizeUpdate` (fMGWS, OutputMode.Update)
  *     emits a keyed snapshot of the open session each batch it grows —
  *     same (user_id, session_idx) re-emitted with monotone n_events,
  *     downstream upserts by key — and exactly one `is_final` row per
  *     closed session, identical to the append twin's emission. The fold
  *     is shared verbatim with the gated append form (foldEvents), so
  *     the oracle gate transitively pins this path's per-event model.
  */
class SessionizeUpdateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  test("native session_window + update mode is rejected at start() " +
    "(UnsupportedOperationChecker: session window streaming aggregations)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val e = intercept[AnalysisException] {
      agg.writeStream.outputMode("update")
        .format("memory").queryName("sess_upd_rejected").start()
    }
    assert(e.getMessage.toLowerCase.contains("session window") ||
      e.getMessage.contains("UNSUPPORTED"),
      s"expected the session-window output-mode rejection, got: ${e.getMessage}")
  }

  test("update-mode fMGWS: per-batch open-session snapshots are keyed and " +
    "monotone, finals match the append twin, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StatefulSessionize.sessionizeUpdate(
      input.toDS()
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .withWatermark("ts", "10 minutes")
        .as[SessionEvent])
      .toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("sess_upd").start()

    // user 1: one session grown across 3 consecutive batches (10 min
    // apart — under the 30 min gap), then a 60-min jump closes it and
    // opens session 2. user 2: a single-batch session, closed by
    // event-time timeout once user 1's stream advances the watermark.
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val min = 60000L
    var eid = 0L
    def ev(u: Long, ms: Long): SessionEvent = { eid += 1; SessionEvent(u, eid, ms) }
    val batches = Seq(
      Seq(ev(1L, t0), ev(2L, t0 + min)),
      Seq(ev(1L, t0 + 10 * min)),
      Seq(ev(1L, t0 + 20 * min)),
      Seq(ev(1L, t0 + 80 * min)), // gap 60 min > 30 → closes s1, opens s2
      Seq(ev(1L, t0 + 300 * min)) // far future: watermark passes everything open
    )
    val perBatch = mutable.ArrayBuffer.empty[Set[SessionSnap]]
    val stateRows = mutable.ArrayBuffer.empty[Long]
    var seen = 0
    batches.foreach { b =>
      input.addData(b: _*)
      q.processAllAvailable()
      val all = spark.table("sess_upd").as[SessionSnap].collect()
      perBatch += all.drop(seen).toSet // update-mode memory sink appends each batch's emissions
      seen = all.length
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows += p.stateOperators(0).numRowsTotal
    }
    q.stop()

    // batches 0-2: user 1's session 1 re-emitted with growing n_events
    // under the SAME key — the upsert contract update mode exists for
    val u1s1 = perBatch.flatMap(_.filter(s => s.user_id == 1L && s.session_idx == 1L))
    assert(u1s1.take(3).map(s => (s.n_events, s.is_final)) ==
      Seq((1L, false), (2L, false), (3L, false)),
      s"open-session snapshots must grow monotonically under one key: $u1s1")
    // batch 3: the 60-min jump emits s1's terminal row AND s2's first
    // snapshot; the same trigger's watermark advance (t0+70min) runs an
    // extra no-data micro-batch that fires user 2's event-time timeout
    // (t0+31min) — timeouts land the moment the watermark passes, inside
    // the same processAllAvailable, not one feed later
    assert(perBatch(3) == Set(
      SessionSnap(1L, 1L, 3L, 20 * min, is_final = true),
      SessionSnap(1L, 2L, 1L, 0L, is_final = false),
      SessionSnap(2L, 1L, 1L, 0L, is_final = true)),
      s"close+reopen+timeout batch wrong: ${perBatch(3)}")
    // finals: every closed session exactly once, equal to the append
    // twin's emission for the same fed events
    val allRows = perBatch.flatten
    val finals = allRows.filter(_.is_final)
    assert(finals.groupBy(s => (s.user_id, s.session_idx)).forall(_._2.size == 1),
      s"a final row must be terminal (once per key): $finals")
    assert(finals.toSet.map((s: SessionSnap) => (s.user_id, s.session_idx, s.n_events, s.duration_ms))
      .contains((2L, 1L, 1L, 0L)),
      s"user 2's session must close by event-time timeout: $finals")
    // every snapshot key eventually resolves: open snapshots either grow
    // (superseded by a later row with more events) or reach a final row —
    // except the stream-tail open session (user 1 session 3)
    val unresolved = allRows.groupBy(s => (s.user_id, s.session_idx))
      .filter { case (_, rows) => !rows.exists(_.is_final) }
      .keySet
    assert(unresolved == Set((1L, 3L)),
      s"only the stream-tail session may stay open: $unresolved")
    assert(stateRows.nonEmpty && stateRows.max <= 3,
      s"state is O(users), saw max ${stateRows.max}")
  }
}
