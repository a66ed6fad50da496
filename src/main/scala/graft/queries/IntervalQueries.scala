package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q32: the partition-lambda's 5-minute-interval filename scheme
  * (reference O18/O19, `bom-partition/bom_partition.py:14-26`,
  * FIXTURES.md F2): the first 11 digits `YYYYMMDDNNN` of the filename
  * encode `datetime(Y,M,D,4,0) + NNN*5 minutes` — e.g.
  * `NEMPriceSetter_2017103128100.csv` → `2017-11-01 03:25` (id 281 rolls
  * past midnight). Exercises regex extract + interval arithmetic.
  */
object IntervalQueries {

  /** Inline fixture names: id 0 (base 04:00), 1, 281 (F2's documented
    * example, day rollover), 287 (max same-cycle), plus a year-end
    * rollover and a second product prefix.
    */
  val fileNames: Seq[String] = Seq(
    "NEMPriceSetter_2017103100000.csv",
    "NEMPriceSetter_2017103100100.csv",
    "NEMPriceSetter_2017103128100.csv",
    "NEMPriceSetter_2017103128700.csv",
    "NEMPriceSetter_2017123128100.csv",
    "TasHydroLevels_2018022800500.csv")

  private def namesValuesSql: String =
    fileNames.map(n => s"('$n')").mkString("(VALUES ", ", ", ")")

  def q32(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = regexp_extract(col("file_name"), "[0-9]{11}", 0)
    val baseTs = to_timestamp(substring(digits, 1, 8), "yyyyMMdd")
    val intervalId = substring(digits, 9, 3).cast("int")
    fileNames.toDF("file_name")
      .withColumn("base_ts", baseTs)
      .withColumn("interval_id", intervalId)
      .withColumn("parsed_ts",
        expr("timestampadd(SECOND, 14400 + interval_id * 300, base_ts)"))
      .select(
        col("file_name"),
        col("interval_id").cast("long").as("interval_id"),
        col("parsed_ts"),
        year(col("parsed_ts")).cast("long").as("year"),
        month(col("parsed_ts")).cast("long").as("month"),
        dayofmonth(col("parsed_ts")).cast("long").as("day"),
        hour(col("parsed_ts")).cast("long").as("hour"),
        minute(col("parsed_ts")).cast("long").as("minute"))
      .orderBy(col("file_name"))
  }

  val q32Oracle: String =
    s"""WITH names(file_name) AS $namesValuesSql,
       |p AS (
       |  SELECT file_name,
       |         regexp_extract(file_name, '[0-9]{11}', 0) AS digits
       |  FROM names),
       |t AS (
       |  SELECT file_name,
       |         CAST(substr(digits, 9, 3) AS INT) AS interval_id,
       |         strptime(substr(digits, 1, 8), '%Y%m%d')
       |           + INTERVAL 4 HOUR
       |           + CAST(substr(digits, 9, 3) AS INT) * INTERVAL 5 MINUTE
       |           AS parsed_ts
       |  FROM p)
       |SELECT file_name, CAST(interval_id AS BIGINT) AS interval_id,
       |       parsed_ts,
       |       year(parsed_ts) AS year, month(parsed_ts) AS month,
       |       day(parsed_ts) AS day, hour(parsed_ts) AS hour,
       |       minute(parsed_ts) AS minute
       |FROM t ORDER BY file_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_interval_filename" -> (q32 _))

  val oracles: Map[String, String] = Map(
    "q32_interval_filename" -> q32Oracle)
}
