package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-data table loader. Each table is one parquet file under the
  * scale-factor directory (TESTDATA.md). Reads stay lazy so Catalyst can
  * push filters/projections into the parquet scan.
  */
object Tables {

  /** The closed set of `events.event_type` values (TESTDATA corpus).
    * Single source of truth for every query that enumerates types
    * (q34 conditional pivot, q49 pivot value list, q63 unpivot) — an
    * out-of-sync private copy would silently drop a type while its
    * like-built oracle still matched.
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Runs `sql` with each (table → view) mapping temporarily registered,
    * dropping every view before returning. `spark.sql` resolves the plan
    * eagerly, so the returned DataFrame outlives the views — queries
    * leave NO session-global catalog state behind (temp views that
    * persist after a query are invisible shared state; see ADVICE r3).
    */
  def sqlWithViews(spark: SparkSession, sfDir: String,
      mappings: (String, String)*)(sql: String): DataFrame = {
    mappings.foreach { case (t, v) =>
      table(spark, sfDir, t).createOrReplaceTempView(v)
    }
    try spark.sql(sql)
    finally mappings.foreach { case (_, v) => spark.catalog.dropTempView(v) }
  }

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 has no
    * native type for (PARQUET_TYPE_ILLEGAL by default). Read the raw
    * nanos as long (legacy conf) and floor-divide to microseconds —
    * exactly the truncation DuckDB applies when it loads the same file
    * into its microsecond TIMESTAMP.
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
