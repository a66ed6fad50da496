package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingNearDup

/** Streaming MinHash near-dup detection: near-dups are flagged against
  * docs seen in EARLIER micro-batches (state works), distinct docs
  * pass, and bucket state EXPIRES once the watermark passes its last
  * activity + TTL (bounded state).
  */
class StreamingNearDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val docA = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val docANear = (1 to 39).map(i => s"alpha$i").mkString(" ") + " changed"
  private val docANear2 = (1 to 39).map(i => s"alpha$i").mkString(" ") + " changedagain"
  private val docB = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val docC = (1 to 40).map(i => s"gamma$i").mkString(" ")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("near-dup lands in the same bucket with high agreement (precondition)") {
    import spark.implicits._
    val sigs = StreamingNearDup.signatures(
      Seq((1L, docA, ts("2024-01-01 10:00:00")),
        (3L, docANear, ts("2024-01-01 10:01:00")),
        (2L, docB, ts("2024-01-01 10:02:00")))
        .toDF("doc_id", "text", "ts"))
      .collect().map(s => s.doc_id -> s).toMap
    assert(sigs(1L).bucket == sigs(3L).bucket,
      "craft docANear so its first-band minhashes match docA")
    val agree = sigs(1L).sig.zip(sigs(3L).sig).count { case (x, y) => x == y }
    assert(agree >= StreamingNearDup.AgreeThreshold, s"agreement only $agree/16")
    assert(sigs(1L).bucket != sigs(2L).bucket)
  }

  test("flags near-dups across micro-batches; state expires after the TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingNearDup.dedup(
      StreamingNearDup.signatures(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "10 minutes")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()

    input.addData((1L, docA, ts("2024-01-01 10:00:00")),
      (2L, docB, ts("2024-01-01 10:00:30")))
    q.processAllAvailable()
    input.addData((3L, docANear, ts("2024-01-01 10:05:00")),
      (4L, docC, ts("2024-01-01 10:06:00")),
      (5L, docB, ts("2024-01-01 10:07:00")))
    q.processAllAvailable()
    // push the watermark far past bucket A's last activity + 1h TTL,
    // then replay a near-dup of A: its state has expired -> kept
    input.addData((6L, docC, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    input.addData((7L, docANear2, ts("2024-01-01 14:01:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("neardup_out")
      .select(col("doc_id"), col("kept"), col("dup_of"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((true, -1L)))
    assert(rows(2L) == ((true, -1L)))
    assert(rows(3L) == ((false, 1L)), s"doc 3 should dup doc 1: ${rows(3L)}")
    assert(rows(4L) == ((true, -1L)))
    assert(rows(5L) == ((false, 2L)), s"exact dup of doc 2: ${rows(5L)}")
    assert(rows(7L) == ((true, -1L)),
      s"doc 7 arrives after bucket expiry and must be kept: ${rows(7L)}")
  }

  test("short docs get verdicts too: exact dups flagged, others kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingNearDup.dedup(
      StreamingNearDup.signatures(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "10 minutes")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_short").start()
    input.addData((1L, "hello world", ts("2024-01-01 10:00:00")),
      (2L, "bye", ts("2024-01-01 10:00:10")))
    q.processAllAvailable()
    input.addData((3L, "hello world", ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("neardup_short")
      .select(col("doc_id"), col("kept"), col("dup_of"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), s"every doc needs a verdict: $rows")
    assert(rows(1L) == ((true, -1L)) && rows(2L) == ((true, -1L)))
    assert(rows(3L) == ((false, 1L)), s"exact short dup: ${rows(3L)}")
  }
}
