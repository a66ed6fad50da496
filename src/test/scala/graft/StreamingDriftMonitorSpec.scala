package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ReleaseOps
import graft.streaming.StreamingDriftMonitor

/** Stream-fed drift must equal batch q117 exactly once the release has
  * fully landed — same bins, same counts, same integer per-milles —
  * and must be consultable mid-stream with partition-consistent
  * histograms (the point of monitoring DURING the crawl).
  */
class StreamingDriftMonitorSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream-fed histogram drift equals batch q117 after the last chunk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // release B's lengths, derived exactly as q117 derives them
    val base = Tables.table(spark, sfDir, "documents")
    val bLens = base.filter(col("doc_id") % 13 =!= 0)
      .select(when(col("doc_id") % 7 === 0, length(col("text")) + 3)
        .otherwise(length(col("text"))).cast("long").as("len"))
      .unionAll(base.filter(col("doc_id") % 17 === 0)
        .select((length(col("text")) + 4).cast("long").as("len")))
      .collect().map(_.getLong(0))

    val chunks = bLens.grouped(math.max(1, bLens.length / 4)).toSeq
    val input = MemoryStream[Long]
    val q = StreamingDriftMonitor.start(
      input.toDF().toDF("len"), "drift_live",
      Files.createTempDirectory("drift-ckpt").toString)
    val aHist = StreamingDriftMonitor.staticHistogram(spark, sfDir)
    try {
      var fed = 0L
      chunks.foreach { c =>
        input.addData(c.toSeq)
        q.processAllAvailable()
        fed += c.length
        // mid-stream consistency: the live histogram always partitions
        // exactly the lengths fed so far
        val live = StreamingDriftMonitor.drift(spark, aHist, "drift_live")
          .collect()
        assert(live.map(_.getAs[Long]("n_b")).sum == fed)
        assert(live.map(_.getAs[Long]("n_a")).sum ==
          Tables.table(spark, sfDir, "documents").count())
      }

      val streamed = StreamingDriftMonitor.drift(spark, aHist, "drift_live")
        .collect().map(_.toString).toSeq
      val batch = ReleaseOps.q117(spark, sfDir).collect()
        .map(_.toString).toSeq
      assert(streamed == batch,
        "fully-landed streaming drift must equal batch q117 row-for-row")
    } finally q.stop()
  }
}
