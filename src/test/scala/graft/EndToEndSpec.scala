package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.grid.{GridFixtures, GridReader}
import graft.queries.GridQueries
import graft.streaming.Ingest

/** SURVEY.md §5.2 end-to-end: fixture grids through the STREAMING ingest
  * path → partitioned serving parquet → the point set must equal what the
  * declarative query layer (q14's posexplode pipeline) computes from the
  * same bytes. Two independent implementations of the raster contract
  * agreeing over the full pipeline.
  */
class EndToEndSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamed serving table equals the declarative explode, point for point") {
    val in = Files.createTempDirectory("e2e-in")
    GridFixtures.files.foreach(f => Files.writeString(in.resolve(f.name), f.content))
    val serving = Files.createTempDirectory("e2e-serving").toString
    Ingest.runAvailableNow(spark, in.toString,
      serving,
      Files.createTempDirectory("e2e-chk").toString,
      Files.createTempDirectory("e2e-arc").toString,
      Files.createTempDirectory("e2e-quar").toString)

    // typed streaming-path result, keyed for comparison
    val streamed = spark.read.parquet(serving)
      .select(col("radiation_type"), col("longitude"), col("latitude"),
        col("radiation"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
      .toSet

    // declarative query-layer result from the identical embedded bytes
    val declarative = GridQueries.explodedPoints(spark)
      .withColumn("radiation_type",
        element_at(split(substring_index(col("file_name"), ".", 1), "_"), 2))
      .select(col("radiation_type"), col("longitude"), col("latitude"),
        col("radiation"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
      .toSet

    assert(streamed == declarative)
    assert(streamed.size == 14)
  }

  test("batch readGridsSafe separates corrupt files without failing") {
    val in = Files.createTempDirectory("safe-in")
    GridFixtures.files.foreach(f => Files.writeString(in.resolve(f.name), f.content))
    Files.writeString(in.resolve("BAD_radiation_20180101_0100.txt"), "garbage")
    val (pts, bad) = GridReader.readGridsSafe(spark, in.toString)
    assert(pts.count() == 14)
    val badRows = bad.collect()
    assert(badRows.length == 1 && badRows.head._1.contains("BAD"))
  }
}
