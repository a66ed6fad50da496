package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup with bounded state:
  * `dropDuplicatesWithinWatermark` keeps a key's state only until the
  * watermark passes it — the E1 operator shape that survives unbounded
  * streams (plain `dropDuplicates` would accumulate state forever).
  */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("duplicates within the watermark window are dropped once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("doc_key", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_key")

    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    input.addData(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:02:00")), // dup within window → dropped
      (2L, ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-01 10:05:00"))) // still within window
    q.processAllAvailable()
    // advance watermark far past key 1's state, then re-emit the key:
    // its dedup state has expired, so it is (correctly) accepted again
    input.addData((9L, ts("2024-01-01 12:00:00")))
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-01 12:01:00")))
    q.processAllAvailable()
    q.stop()

    val keys = spark.table("dedup_out")
      .select(col("doc_key")).as[Long].collect().toSeq
    assert(keys.count(_ == 1L) == 2, s"key 1 once per window: $keys")
    assert(keys.count(_ == 2L) == 1 && keys.count(_ == 9L) == 1, keys.toString)
  }
}
