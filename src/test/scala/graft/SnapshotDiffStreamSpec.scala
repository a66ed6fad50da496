package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ReleaseOps
import graft.streaming.SnapshotDiffStream

/** The q113 streaming twin's contract: feeding snapshot B through the
  * incremental foreachBatch diff, in arbitrary chunks, and finalizing
  * must reproduce the batch full-outer-join diff EXACTLY — and a
  * replayed micro-batch must not change the answer (at-least-once
  * delivery safety).
  */
class SnapshotDiffStreamSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def collectReport(target: String): Seq[(String, Long, Long)] =
    SnapshotDiffStream.report(spark, ReleaseOps.snapshotA(spark, sfDir), target)
      .collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("id_sum"))).toSeq

  test("incremental diff over chunked snapshot B equals the batch q113") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = Files.createTempDirectory("snapdiff-ledger").toString

    val expected = ReleaseOps.q113(spark, sfDir).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("id_sum"))).toSeq

    // snapshot B as a stream: three uneven chunks, order scrambled by
    // hashing — the diff must not care how the release lands
    val bRows = ReleaseOps.snapshotB(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) => (id * 2654435761L) % 97 }
    val chunks = Seq(
      bRows.take(bRows.length / 3),
      bRows.slice(bRows.length / 3, 2 * bRows.length / 3),
      bRows.drop(2 * bRows.length / 3))
    assert(chunks.forall(_.nonEmpty), "fixture must fill three chunks")

    val aFp = ReleaseOps.snapshotA(spark, sfDir)
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("doc_id", "fp_b")
      .writeStream
      .outputMode("append")
      .foreachBatch(SnapshotDiffStream.diffSink(aFp, target) _)
      .option("checkpointLocation",
        Files.createTempDirectory("snapdiff-ckpt").toString)
      .start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
    } finally q.stop()

    assert(collectReport(target) == expected,
      "incremental diff must equal the batch full-outer join")
  }

  test("replaying a micro-batch leaves the finalized diff unchanged") {
    import spark.implicits._
    val target = Files.createTempDirectory("snapdiff-ledger2").toString
    val aFp = ReleaseOps.snapshotA(spark, sfDir)
    val b = ReleaseOps.snapshotB(spark, sfDir)

    // drive the sink directly with two batches, then REPLAY batch 1
    // (the crash-between-write-and-commit case foreachBatch must absorb)
    val b0 = b.filter(pmod(col("doc_id"), lit(2)) === 0)
    val b1 = b.filter(pmod(col("doc_id"), lit(2)) =!= 0)
    SnapshotDiffStream.diffSink(aFp, target)(b0, 0L)
    SnapshotDiffStream.diffSink(aFp, target)(b1, 1L)
    val before = collectReport(target)
    SnapshotDiffStream.diffSink(aFp, target)(b1, 1L) // replay
    assert(collectReport(target) == before, "replay must be a no-op")

    // and the split-by-parity run still matches the batch q113
    val expected = ReleaseOps.q113(spark, sfDir).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("id_sum"))).toSeq
    assert(before == expected)
  }

  test("a doc redelivered in a LATER batch does not double-count") {
    // at-least-once SOURCES can redeliver a doc under a new batchId —
    // the partition overwrite can't help there; report() must dedupe
    val target = Files.createTempDirectory("snapdiff-ledger3").toString
    val aFp = ReleaseOps.snapshotA(spark, sfDir)
    val b = ReleaseOps.snapshotB(spark, sfDir)
    SnapshotDiffStream.diffSink(aFp, target)(b, 0L)
    val clean = collectReport(target)
    // redeliver a slice of B as a later batch (overlapping doc_ids)
    SnapshotDiffStream.diffSink(aFp, target)(
      b.filter(pmod(col("doc_id"), lit(3)) === 0), 5L)
    assert(collectReport(target) == clean,
      "cross-batch redelivery must not change the finalized diff")
    val expected = ReleaseOps.q113(spark, sfDir).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("id_sum"))).toSeq
    assert(clean == expected)
  }
}
