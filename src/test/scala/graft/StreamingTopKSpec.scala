package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.ItemIn

/** transformWithState heavy hitters: per-window top-k emits when the
  * watermark passes the window end, each window's state is freed after
  * emission, and late-but-in-watermark rows land in their own window.
  */
class StreamingTopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = GraftSession.local(4)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private val W = 60 * 60 * 1000L // 1h windows

  test("emits per-window top-k on watermark passage; late rows window correctly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ItemIn]
    val out = StreamingTopK.topk(
      input.toDS().withWatermark("ts", "10 minutes").as[ItemIn],
      capacity = 16, k = 2, windowMs = W)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("topk_out").start()

    // window A = [10:00, 11:00): a x3, b x2, c x1 under key "views"
    input.addData(
      ItemIn("views", "a", ts("2024-01-01 10:05:00")),
      ItemIn("views", "a", ts("2024-01-01 10:10:00")),
      ItemIn("views", "b", ts("2024-01-01 10:15:00")),
      ItemIn("views", "a", ts("2024-01-01 10:20:00")),
      ItemIn("views", "b", ts("2024-01-01 10:25:00")),
      ItemIn("views", "c", ts("2024-01-01 10:30:00")),
      ItemIn("clicks", "x", ts("2024-01-01 10:31:00")))
    q.processAllAvailable()
    assert(spark.table("topk_out").isEmpty, "nothing emits before the watermark")

    // row at 11:05 (window B) + a LATE row for window A (10:55, inside
    // the 10-min watermark) — watermark stays < 11:00, A still open
    input.addData(
      ItemIn("views", "d", ts("2024-01-01 11:05:00")),
      ItemIn("views", "b", ts("2024-01-01 10:55:00")))
    q.processAllAvailable()

    // push the watermark past BOTH window ends
    input.addData(ItemIn("views", "z", ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("topk_out")
      .select(col("key"), col("window_end_ms"), col("rank"), col("item"),
        col("count"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))
    val endA = Timestamp.valueOf("2024-01-01 11:00:00").getTime
    val endB = Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val viewsA = rows.filter(r => r._1 == "views" && r._2 == endA)
      .sortBy(_._3).map(r => (r._4, r._5)).toSeq
    // late 10:55 "b" joined window A: a=3, b=3 -> tie, (count desc, item asc)
    assert(viewsA == Seq(("a", 3L), ("b", 3L)), s"window A top-2: $viewsA")
    val viewsB = rows.filter(r => r._1 == "views" && r._2 == endB)
      .map(r => (r._4, r._5)).toSeq
    assert(viewsB == Seq(("d", 1L)), s"window B: $viewsB")
    val clicksA = rows.filter(r => r._1 == "clicks" && r._2 == endA)
      .map(r => (r._4, r._5)).toSeq
    assert(clicksA == Seq(("x", 1L)), s"clicks window A: $clicksA")
  }
}
