package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E7 stream-static enrichment: a stream joined against a static
  * dimension table — the standard production pattern for attaching slowly
  * changing reference data to an event stream. The static side is
  * broadcast per micro-batch (no stream state, no watermark needed for
  * an inner equi-join against a static table), so at cluster scale the
  * stream never shuffles for the join.
  */
class StreamStaticJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-static broadcast join enriches events with dimension rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select($"n_nationkey".as("key"), $"n_name".as("name"))

    val input = MemoryStream[(Timestamp, Long, Double)]
    val enriched = input.toDF().toDF("ts", "key", "value")
      .join(broadcast(dim), "key")
      .select($"ts", $"key", $"name", $"value")

    val q = enriched.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enriched_out")
      .start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:01"), 0L, 1.0),
        (ts("2024-01-01 00:00:02"), 3L, 2.0),
        (ts("2024-01-01 00:00:03"), 999L, 3.0)) // no dim row -> dropped
      q.processAllAvailable()
      val rows = spark.table("enriched_out").collect()
      assert(rows.length == 2, "inner join must drop the unmatched key")
      val names = rows.map(r => r.getAs[Long]("key") -> r.getAs[String]("name")).toMap
      assert(names.contains(0L) && names.contains(3L))
      assert(names.values.forall(_.nonEmpty))

      // left join keeps unmatched stream rows with null dimension columns
    } finally q.stop()
  }

  test("left stream-static join keeps unmatched events (quarantine-able)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select($"n_nationkey".as("key"), $"n_name".as("name"))

    val input = MemoryStream[(Timestamp, Long, Double)]
    val enriched = input.toDF().toDF("ts", "key", "value")
      .join(broadcast(dim), Seq("key"), "left")
      .select($"ts", $"key", $"name", $"value")

    val q = enriched.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enriched_left_out")
      .start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:01"), 1L, 1.0),
        (ts("2024-01-01 00:00:02"), 12345L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched_left_out").collect()
      assert(rows.length == 2)
      val byKey = rows.map(r => r.getAs[Long]("key") -> r.getAs[String]("name")).toMap
      assert(byKey(1L) != null, "matched key must be enriched")
      assert(byKey(12345L) == null, "unmatched key must surface with null dim")
    } finally q.stop()
  }

  test("the micro-batch plans a broadcast join, not a stream shuffle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select($"n_nationkey".as("key"), $"n_name".as("name"))
    val input = MemoryStream[(Timestamp, Long, Double)]
    val enriched = input.toDF().toDF("ts", "key", "value")
      .join(broadcast(dim), "key")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("plan_probe").start()
    try {
      input.addData((ts("2024-01-01 00:00:01"), 0L, 1.0))
      q.processAllAvailable()
      assert(spark.table("plan_probe").count() == 1)
      // capture the executed micro-batch plan that q.explain() prints
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos)) { q.explain() }
      val plan = bos.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast join in micro-batch plan:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"stream must not sort-merge against a static dim:\n$plan")
    } finally q.stop()
  }
}
