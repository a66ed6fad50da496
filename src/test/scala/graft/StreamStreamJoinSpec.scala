package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join with watermarks on both sides: clicks
  * joined to the purchases they precede by ≤30 min for the same user.
  * State on both sides is bounded by the watermark + interval condition
  * — the only join shape that survives two unbounded streams.
  */
class StreamStreamJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("clicks attribute to purchases within the interval; state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]

    val c = clicks.toDF().toDF("user_id", "click_ts")
      .withWatermark("click_ts", "0 seconds")
    val p = purchases.toDF().toDF("p_user_id", "purchase_ts")
      .withWatermark("purchase_ts", "0 seconds")

    val joined = c.join(p,
      col("user_id") === col("p_user_id") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()

    clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00")))
    purchases.addData((1L, ts("2024-01-01 10:20:00"))) // within 30 min → match
    q.processAllAvailable()
    purchases.addData((2L, ts("2024-01-01 11:30:00"))) // 85 min later → no match
    clicks.addData((3L, ts("2024-01-01 12:00:00")))
    purchases.addData((3L, ts("2024-01-01 12:10:00"))) // match
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ss_join_out")
      .select(col("user_id")).as[Long].collect().sorted.toSeq
    assert(rows == Seq(1L, 3L), s"expected users 1 and 3 attributed, got $rows")
  }
}
