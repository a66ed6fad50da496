package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q41: semi-structured extraction from the `events.props` JSON string
  * column — `from_json` with an explicit schema (codegen'd Jackson parse,
  * the idiomatic Spark route; `get_json_object` would re-parse per
  * field). At 100 TB, parse-once-project-many is the difference between
  * one and N passes over the payload.
  */
object JsonQueries {

  private val propsSchema = StructType(Seq(StructField("k", LongType)))

  def q41(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.table(spark, dir, "events")
      .withColumn("props_parsed", from_json(col("props"), propsSchema))
      .withColumn("k", col("props_parsed.k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q41Oracle: String =
    """WITH parsed AS (
      |  SELECT event_type,
      |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type,
      |       count(*) AS n_events,
      |       count(k) AS n_with_k,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       round(avg(k), 4) AS avg_k,
      |       min(k) AS min_k, max(k) AS max_k
      |FROM parsed GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_json_extract" -> (q41 _))

  val oracles: Map[String, String] = Map(
    "q41_json_extract" -> q41Oracle)
}
