package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E7 streaming variant: watermarked tumbling-window aggregation driven
  * deterministically through MemoryStream (the batch twin is oracle-
  * checked as q20).
  */
class StreamingWindowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling 1h window + 10min watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF()
      .toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))

    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("win_out")
      .start()

    // batch 1: two events in the 10:00 window, one in 11:00
    input.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "view", 5.0))
    q.processAllAvailable()
    // append mode: nothing finalized yet (watermark at 10:55)
    // batch 2: advance watermark beyond 11:00 → 10:00 window closes
    input.addData((ts("2024-01-01 12:30:00"), "view", 7.0))
    q.processAllAvailable()
    // batch 3: LATE event for 10:00 window — must be dropped
    input.addData((ts("2024-01-01 10:30:00"), "click", 99.0))
    q.processAllAvailable()
    // close everything
    input.addData((ts("2024-01-01 14:00:00"), "click", 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_out")
      .select(col("window.start").cast("string").as("start"),
        col("event_type"), col("n"), col("v"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)),
      s"10:00 click window wrong (late event must be dropped): $out")
    assert(out.contains(("2024-01-01 11:00:00", "view", 1L, 5.0)), out.toString)
  }

  test("approx_count_distinct (HLL++) stays within 5% at sf0.001") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val exact = orders.select(countDistinct(col("o_custkey"))).head.getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"), 0.02))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
