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

  /** `events.ts` has shipped in two physical layouts across testdata
    * generations, so the load adapts to the file's actual schema:
    *
    *  - TIMESTAMP(NANOS) (rounds ≤7), which Spark 4 has no native type
    *    for (PARQUET_TYPE_ILLEGAL by default): read the raw nanos as
    *    long (legacy conf) and floor-divide to microseconds — exactly
    *    the truncation DuckDB applies loading the same file into its
    *    microsecond TIMESTAMP. ScaleUp-written dirs keep this int64
    *    form.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-8 regeneration),
    *    which Spark reads as TIMESTAMP_NTZ: cast to the session-local
    *    TIMESTAMP — the session timezone is pinned UTC everywhere in
    *    this repo, so the wall-clock field values are preserved
    *    verbatim, matching DuckDB's naive read of the same file.
    *
    * Either way downstream queries see one µs-precision `timestamp`
    * column with identical values.
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // Try the plain read first: the MICROS layout needs no legacy conf, and
    // setting `nanosAsLong` unconditionally would leak a non-default
    // parquet-read mode into every later read on the shared session
    // (ADVICE r8). Only a NANOS file (PARQUET_TYPE_ILLEGAL on plain read)
    // flips the conf — and for that layout it must STAY set, because the
    // task-side footer conversion re-reads it at execution time.
    val raw =
      try spark.read.parquet(path)
      catch {
        case scala.util.control.NonFatal(_) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
