package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table loader. Each table is one parquet file under the
  * scale-factor directory (TESTDATA.md). Reads stay lazy so Catalyst can
  * push filters/projections into the parquet scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
