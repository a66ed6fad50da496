package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.grid.{GridFixtures, GridReader}

/** Source/sink format breadth: the serving point table round-trips
  * through parquet, ORC, JSON, and header-CSV with values intact.
  */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def points = {
    val in = Files.createTempDirectory("fmt-in")
    GridFixtures.files.foreach(f => Files.writeString(in.resolve(f.name), f.content))
    GridReader.readGrids(spark, in.toString)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, Double, Double, Int)] =
    df.selectExpr("date", "radiation_type", "longitude", "latitude",
        "cast(radiation as int) as radiation")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4)))
      .toSet

  test("points survive parquet, orc, json, and csv round-trips") {
    val pts = points.cache()
    val expected = canon(pts.toDF())
    assert(expected.size == 14)
    val base = Files.createTempDirectory("fmt-out").toString

    pts.write.mode("overwrite").parquet(s"$base/p")
    assert(canon(spark.read.parquet(s"$base/p")) == expected)

    pts.write.mode("overwrite").orc(s"$base/o")
    assert(canon(spark.read.orc(s"$base/o")) == expected)

    pts.write.mode("overwrite").json(s"$base/j")
    val jsonBack = spark.read.json(s"$base/j")
      .selectExpr("date", "radiation_type", "cast(longitude as double) longitude",
        "cast(latitude as double) latitude", "cast(radiation as int) radiation")
    assert(canon(jsonBack) == expected)

    // no inferSchema: it would promote the "yyyy-MM-dd HH:mm" date
    // string to a timestamp; read as strings and cast explicitly
    pts.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    val csvBack = spark.read.option("header", "true").csv(s"$base/c")
      .selectExpr("date", "radiation_type", "cast(longitude as double) longitude",
        "cast(latitude as double) latitude", "cast(radiation as int) radiation")
    assert(canon(csvBack) == expected)
    pts.unpersist()
  }
}
