package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E7 streaming sink pattern: foreachBatch + dynamic partition overwrite
  * = idempotent upsert. Structured Streaming guarantees at-least-once
  * batch delivery; replaying a batch must not duplicate rows, so each
  * batch (a) dedupes within itself and (b) OVERWRITES exactly the
  * partitions it touches. Re-running the same batch function twice is
  * then a no-op — the property this spec drives directly.
  */
class ForeachBatchUpsertSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** The per-batch upsert: dedupe on event id (keep min value for
    * determinism), stamp the partition day, overwrite only touched days.
    */
  private def upsertBatch(target: String)(batch: DataFrame, id: Long): Unit =
    batch
      .groupBy(col("event_id"))
      .agg(min(col("value")).as("value"), min(col("ts")).as("ts"))
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(target)

  test("replaying a batch through the upsert sink does not duplicate rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = Files.createTempDirectory("upsert-target").toString

    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = input.toDF().toDF("event_id", "ts", "value")
      .writeStream
      .outputMode("append")
      .foreachBatch(upsertBatch(target) _)
      .option("checkpointLocation",
        Files.createTempDirectory("upsert-ckpt").toString)
      .start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 5.0),
        (1L, ts("2024-01-01 10:00:00"), 5.0), // in-batch duplicate
        (2L, ts("2024-01-02 11:00:00"), 7.0))
      q.processAllAvailable()
      val afterFirst = spark.read.parquet(target)
      assert(afterFirst.count() == 2, "in-batch duplicate must collapse")

      // simulate an at-least-once REPLAY of the same payload (as after a
      // failure between sink write and offset commit): rows land in a
      // new batch, dedupe + dynamic overwrite keep the target identical
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 5.0),
        (2L, ts("2024-01-02 11:00:00"), 7.0))
      q.processAllAvailable()
      val afterReplay = spark.read.parquet(target)
      assert(afterReplay.count() == 2, "replay must be a no-op")
      // partition-column inference reads `day` back as DATE
      val rows = afterReplay.select("event_id", "value", "day")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2).toString)).toSet
      assert(rows == Set(
        (1L, 5.0, "2024-01-01"),
        (2L, 7.0, "2024-01-02")))
    } finally q.stop()
  }

  test("a new day's batch overwrites only its own partition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val target = Files.createTempDirectory("upsert-target2").toString

    val input = MemoryStream[(Long, Timestamp, Double)]
    val q = input.toDF().toDF("event_id", "ts", "value")
      .writeStream
      .outputMode("append")
      .foreachBatch(upsertBatch(target) _)
      .option("checkpointLocation",
        Files.createTempDirectory("upsert-ckpt2").toString)
      .start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), 5.0))
      q.processAllAvailable()
      input.addData((9L, ts("2024-01-03 09:00:00"), 2.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(target)
      // day 1 data survives a later batch that touched only day 3
      assert(rows.count() == 2)
      assert(rows.filter(col("day") === "2024-01-01").count() == 1)
      assert(rows.filter(col("day") === "2024-01-03").count() == 1)
    } finally q.stop()
  }
}
