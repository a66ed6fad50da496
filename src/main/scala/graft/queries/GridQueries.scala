package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.grid.GridFixtures

/** q14-q16: the reference's core raster→points surface (SURVEY.md §1.4,
  * §2.1 O1-O9, O13-O17) expressed declaratively so Catalyst plans it.
  *
  * Both engines consume the identical embedded fixture bytes
  * ([[GridFixtures]]): Spark via `createDataFrame`, DuckDB via generated
  * inline `VALUES` CTEs in the oracle SQL.
  */
object GridQueries {

  /** Shared explode pipeline: raw `(file_name, line_no, line)` →
    * one row per non-NODATA cell with affine lon/lat. Pure built-in
    * expressions (`posexplode`+`split`), no UDF — stays inside
    * whole-stage codegen and scales per-file at 100 TB (the file is the
    * unit of parallelism, matching the reference's 1-file-1-lambda model).
    */
  def explodedPoints(spark: SparkSession): DataFrame = {
    val raw = GridFixtures.linesDF(spark)
    def hdrVal(no: Int): Column =
      max(when(col("line_no") === no,
        element_at(split(trim(col("line")), " +"), 2)))
    val hdr = raw
      .filter(col("line_no") < 6)
      .groupBy(col("file_name"))
      .agg(
        hdrVal(0).cast("int").as("ncols"),
        hdrVal(1).cast("int").as("nrows"),
        hdrVal(2).cast("double").as("xll"),
        hdrVal(3).cast("double").as("yll"),
        hdrVal(4).cast("double").as("cell"),
        hdrVal(5).cast("int").as("nodata"))
    val cells = raw
      .filter(col("line_no") >= 6)
      .select(
        col("file_name"),
        (col("line_no") - 6).as("row_idx"),
        posexplode(split(trim(col("line")), " +")).as(Seq("col_idx", "tok")))
      .withColumn("radiation", col("tok").cast("int"))
    cells
      .join(broadcast(hdr), "file_name") // header side is tiny by construction
      .filter(col("radiation") =!= col("nodata"))
      .select(
        col("file_name"),
        (col("xll") + col("col_idx") * col("cell")).as("longitude"),
        (col("yll") + (col("nrows") - lit(1) - col("row_idx")) * col("cell"))
          .as("latitude"),
        col("radiation"))
  }

  /** DuckDB twin of [[explodedPoints]] as a CTE body (no trailing SELECT). */
  private val explodedPointsCte: String =
    s"""raw(file_name, line_no, line) AS ${GridFixtures.linesValuesSql},
       |hdr AS (
       |  SELECT file_name,
       |    CAST(max(CASE WHEN line_no=0 THEN split_part(trim(line), ' ', 2) END) AS INT)    AS ncols,
       |    CAST(max(CASE WHEN line_no=1 THEN split_part(trim(line), ' ', 2) END) AS INT)    AS nrows,
       |    CAST(max(CASE WHEN line_no=2 THEN split_part(trim(line), ' ', 2) END) AS DOUBLE) AS xll,
       |    CAST(max(CASE WHEN line_no=3 THEN split_part(trim(line), ' ', 2) END) AS DOUBLE) AS yll,
       |    CAST(max(CASE WHEN line_no=4 THEN split_part(trim(line), ' ', 2) END) AS DOUBLE) AS cell,
       |    CAST(max(CASE WHEN line_no=5 THEN split_part(trim(line), ' ', 2) END) AS INT)    AS nodata
       |  FROM raw WHERE line_no < 6 GROUP BY file_name),
       |toks AS (
       |  SELECT file_name, line_no - 6 AS row_idx,
       |         generate_subscripts(string_split_regex(trim(line), ' +'), 1) - 1 AS col_idx,
       |         CAST(unnest(string_split_regex(trim(line), ' +')) AS INT) AS radiation
       |  FROM raw WHERE line_no >= 6),
       |points AS (
       |  SELECT t.file_name,
       |         h.xll + t.col_idx * h.cell AS longitude,
       |         h.yll + (h.nrows - 1 - t.row_idx) * h.cell AS latitude,
       |         t.radiation
       |  FROM toks t JOIN hdr h USING (file_name)
       |  WHERE t.radiation <> h.nodata)""".stripMargin

  // ---------------------------------------------------------------- q14

  def q14(spark: SparkSession, sfDir: String): DataFrame =
    explodedPoints(spark)
      .orderBy(col("file_name"), col("longitude"), col("latitude"))

  val q14Oracle: String =
    s"""WITH $explodedPointsCte
       |SELECT file_name, longitude, latitude, radiation
       |FROM points ORDER BY file_name, longitude, latitude""".stripMargin

  // ---------------------------------------------------------------- q15

  def q15(spark: SparkSession, sfDir: String): DataFrame =
    explodedPoints(spark)
      .withColumn("radiation_type",
        element_at(split(substring_index(col("file_name"), ".", 1), "_"), 2))
      .withColumn("lat_band", floor(col("latitude")).cast("long"))
      .groupBy(col("radiation_type"), col("lat_band"))
      .agg(
        count(lit(1)).as("n_points"),
        round(avg(col("radiation")), 2).as("avg_radiation"),
        max(col("radiation")).as("max_radiation"),
        min(col("radiation")).as("min_radiation"))
      .orderBy(col("radiation_type"), col("lat_band"))

  val q15Oracle: String =
    s"""WITH $explodedPointsCte
       |SELECT split_part(split_part(file_name, '.', 1), '_', 2) AS radiation_type,
       |       CAST(floor(latitude) AS BIGINT) AS lat_band,
       |       count(*) AS n_points,
       |       round(avg(radiation), 2) AS avg_radiation,
       |       max(radiation) AS max_radiation,
       |       min(radiation) AS min_radiation
       |FROM points GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q16

  /** Filename → Sydney-local partition tuple (O13-O17): parse
    * `<product>_<type>_<YYYYMMDD>_<HHMM...>` as UTC with minutes dropped
    * (`bom/bom.py:102`), convert to Australia/Sydney (DST-aware), derive
    * the `year/month/day/hour` partition key (`bom/bom.py:28-32`).
    */
  def q16(spark: SparkSession, sfDir: String): DataFrame = {
    val names = GridFixtures.fileNamesDF(spark)
    val base = substring_index(col("file_name"), ".", 1)
    val utcNaive = to_timestamp(
      concat_ws(" ",
        element_at(split(base, "_"), 3),
        substring(element_at(split(base, "_"), 4), 1, 2)),
      "yyyyMMdd HH")
    names
      .withColumn("radiation_type", element_at(split(base, "_"), 2))
      .withColumn("local_ts", from_utc_timestamp(utcNaive, "Australia/Sydney"))
      .select(
        col("file_name"),
        col("radiation_type"),
        date_format(col("local_ts"), "yyyy-MM-dd HH:mm").as("local_datetime"),
        year(col("local_ts")).cast("long").as("year"),
        month(col("local_ts")).cast("long").as("month"),
        dayofmonth(col("local_ts")).cast("long").as("day"),
        hour(col("local_ts")).cast("long").as("hour"))
      .orderBy(col("file_name"))
  }

  val q16Oracle: String =
    s"""WITH names(file_name) AS ${GridFixtures.fileNamesValuesSql},
       |p AS (
       |  SELECT file_name,
       |         split_part(split_part(file_name, '.', 1), '_', 2) AS radiation_type,
       |         timezone('Australia/Sydney', timezone('UTC',
       |           strptime(split_part(split_part(file_name, '.', 1), '_', 3) || ' ' ||
       |                    substr(split_part(split_part(file_name, '.', 1), '_', 4), 1, 2),
       |                    '%Y%m%d %H'))) AS local_ts
       |  FROM names)
       |SELECT file_name, radiation_type,
       |       strftime(local_ts, '%Y-%m-%d %H:%M') AS local_datetime,
       |       year(local_ts) AS year, month(local_ts) AS month,
       |       day(local_ts) AS day, hour(local_ts) AS hour
       |FROM p ORDER BY file_name""".stripMargin

  // ---------------------------------------------------------------- q76

  /** Spatial cell binning over the exploded radiation points: aggregate
    * to 0.5° grid cells (geohash-style spatial rollup — the query a
    * radiation-map tile server runs). Bin keys via `floor(coord * 2)`:
    * multiplying a double by 2 is exact, so the binning is bit-identical
    * cross-engine with no rounding involved. One shuffle on the cell key.
    */
  def q76(spark: SparkSession, sfDir: String): DataFrame =
    explodedPoints(spark)
      .withColumn("lon_bin", floor(col("longitude") * 2).cast("long"))
      .withColumn("lat_bin", floor(col("latitude") * 2).cast("long"))
      .groupBy(col("lon_bin"), col("lat_bin"))
      .agg(
        count(lit(1)).as("n_points"),
        round(avg(col("radiation")), 2).as("avg_radiation"),
        max(col("radiation")).as("max_radiation"))
      .orderBy(col("lon_bin"), col("lat_bin"))

  val q76Oracle: String =
    s"""WITH $explodedPointsCte
       |SELECT CAST(floor(longitude * 2) AS BIGINT) AS lon_bin,
       |       CAST(floor(latitude * 2) AS BIGINT) AS lat_bin,
       |       count(*) AS n_points,
       |       round(avg(radiation), 2) AS avg_radiation,
       |       max(radiation) AS max_radiation
       |FROM points GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q77

  /** Nearest-anchor assignment: each point goes to the closest of four
    * fixed reference stations by SQUARED Euclidean distance — exact
    * double arithmetic (products and sums of parquet-derived values, no
    * sqrt/trig whose libm results could differ in the last ulp), with a
    * lowest-id tie preference spelled as an explicit comparison chain so
    * both engines break ties identically.
    */
  private val Anchors: Seq[(Double, Double)] =
    Seq((140.0, -20.0), (145.0, -30.0), (150.0, -25.0), (135.0, -35.0))

  def q77(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = explodedPoints(spark)
    val d = Anchors.zipWithIndex.map { case ((ax, ay), i) =>
      ((col("longitude") - ax) * (col("longitude") - ax) +
        (col("latitude") - ay) * (col("latitude") - ay)).as(s"d$i")
    }
    pts.select((col("radiation") +: d): _*)
      .withColumn("anchor",
        when(col("d0") <= col("d1") && col("d0") <= col("d2") &&
          col("d0") <= col("d3"), 0L)
          .when(col("d1") <= col("d2") && col("d1") <= col("d3"), 1L)
          .when(col("d2") <= col("d3"), 2L)
          .otherwise(3L))
      .groupBy(col("anchor"))
      .agg(
        count(lit(1)).as("n_points"),
        round(avg(col("radiation")), 2).as("avg_radiation"))
      .orderBy(col("anchor"))
  }

  val q77Oracle: String = {
    val dists = Anchors.zipWithIndex.map { case ((ax, ay), i) =>
      s"(longitude - $ax) * (longitude - $ax) + (latitude - $ay) * (latitude - $ay) AS d$i"
    }.mkString(",\n       ")
    s"""WITH $explodedPointsCte,
       |dd AS (
       |  SELECT radiation,
       |       $dists
       |  FROM points)
       |SELECT CASE WHEN d0 <= d1 AND d0 <= d2 AND d0 <= d3 THEN 0
       |            WHEN d1 <= d2 AND d1 <= d3 THEN 1
       |            WHEN d2 <= d3 THEN 2
       |            ELSE 3 END AS anchor,
       |       count(*) AS n_points,
       |       round(avg(radiation), 2) AS avg_radiation
       |FROM dd GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
