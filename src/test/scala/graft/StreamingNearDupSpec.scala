package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingNearDup

/** Streaming MinHash near-dup detection: near-dups are flagged against
  * docs seen in EARLIER micro-batches (state works), distinct docs pass,
  * and the signature projection is the batch-identical native expr.
  */
class StreamingNearDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val docA = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val docANear = (1 to 39).map(i => s"alpha$i").mkString(" ") + " changed"
  private val docB = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val docC = (1 to 40).map(i => s"gamma$i").mkString(" ")

  test("near-dup lands in the same bucket with high agreement (precondition)") {
    import spark.implicits._
    val sigs = StreamingNearDup.signatures(
      Seq((1L, docA), (3L, docANear), (2L, docB))
        .toDF("doc_id", "text"))
      .collect().map(s => s.doc_id -> s).toMap
    assert(sigs(1L).bucket == sigs(3L).bucket,
      "craft docANear so its first-band minhashes match docA")
    val agree = sigs(1L).sig.zip(sigs(3L).sig).count { case (x, y) => x == y }
    assert(agree >= StreamingNearDup.AgreeThreshold, s"agreement only $agree/16")
    assert(sigs(1L).bucket != sigs(2L).bucket)
  }

  test("flags near-dups across micro-batches, keeps distinct docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamingNearDup.dedup(
      StreamingNearDup.signatures(input.toDF().toDF("doc_id", "text")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()

    input.addData((1L, docA), (2L, docB))
    q.processAllAvailable()
    input.addData((3L, docANear), (4L, docC), (5L, docB))
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
  }
}
