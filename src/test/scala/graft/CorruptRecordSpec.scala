package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input quarantine at the DataFrame level — the engine-side
  * analogue of the reference's SQS dead-letter queue (SURVEY.md §3 EP1:
  * 5 failed deliveries → DLQ). PERMISSIVE parse keeps the job alive and
  * lands bad rows in a corrupt-record column for quarantine, instead of
  * one bad cell killing a 100 TB ingest.
  */
class CorruptRecordSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("corrupt-json")
    Files.writeString(dir.resolve("part-0.json"), lines.mkString("\n"))
    dir.toString
  }

  private val schema = new StructType()
    .add("id", LongType)
    .add("name", StringType)
    .add("_corrupt_record", StringType)

  test("PERMISSIVE JSON parse quarantines malformed rows, keeps good ones") {
    val path = writeLines(Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": "not-a-number", "name": "bad-type"}""",
      """{"id": 3 BROKEN JSON""",
      """{"id": 4, "name": "fine"}"""))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // corrupt-record column requires a materialized referent
    val good = df.filter(col("_corrupt_record").isNull)
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(quarantined.count() == 2)
    // quarantined rows retain the raw payload for replay — the DLQ contract
    val raw = quarantined.select("_corrupt_record")
      .collect().map(_.getString(0))
    assert(raw.exists(_.contains("not-a-number")))
    assert(raw.exists(_.contains("BROKEN")))
    df.unpersist()
  }

  test("FAILFAST surfaces the first malformed row as a job error") {
    val path = writeLines(Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 3 BROKEN"""))
    val strict = spark.read
      .schema(new StructType().add("id", LongType).add("name", StringType))
      .option("mode", "FAILFAST").json(path)
    val e = intercept[Exception] { strict.collect() }
    assert(e.getMessage != null)
  }

  test("DROPMALFORMED silently keeps only parseable rows") {
    val path = writeLines(Seq(
      """{"id": 1, "name": "ok"}""",
      """NOT JSON AT ALL""",
      """{"id": 2, "name": "ok2"}"""))
    val dropped = spark.read
      .schema(new StructType().add("id", LongType).add("name", StringType))
      .option("mode", "DROPMALFORMED").json(path)
    assert(dropped.count() == 2)
  }
}
