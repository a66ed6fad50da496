package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.table

/** q70-q71: IGNORE NULLS carry-forward fill and ordered listagg — the
  * last two window/aggregation spellings the inventory lacked.
  */
object Relational8 {

  // ---------------------------------------------------------------- q70

  /** Last-observation-carried-forward (sensor gap fill): null out a
    * deterministic subset of readings, then fill each hole with the most
    * recent non-null value via `last_value ... IGNORE NULLS` over a
    * running frame. One shuffle on user_id; the filled value is a PICKED
    * raw double, so no rounding is needed cross-engine. (Spark spells the
    * modifier `last_value(v) IGNORE NULLS`, DuckDB `last_value(v IGNORE
    * NULLS)` — same semantics.)
    */
  def q70(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "events").createOrReplaceTempView("events_v70")
    spark.sql(
      """SELECT user_id, event_id, v_sparse,
        |       last_value(v_sparse) IGNORE NULLS OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS v_filled
        |FROM (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
        |           AS v_sparse
        |  FROM events_v70 WHERE user_id % 10 = 0)
        |ORDER BY user_id, event_id""".stripMargin)
  }

  val q70Oracle: String =
    """SELECT user_id, event_id, v_sparse,
      |       last_value(v_sparse IGNORE NULLS) OVER
      |         (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS v_filled
      |FROM (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
      |           AS v_sparse
      |  FROM events WHERE user_id % 10 = 0)
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q71

  /** Ordered string aggregation via listagg WITHIN GROUP — the direct
    * spelling of what q35 builds manually (sort_array + array_join).
    * The explicit ORDER BY inside the aggregate is what makes it
    * deterministic; bare listagg concatenates in arrival order.
    */
  def q71(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "customer").createOrReplaceTempView("customer_v71")
    spark.sql(
      """SELECT c_mktsegment,
        |       listagg(CAST(c_custkey AS STRING), ',')
        |         WITHIN GROUP (ORDER BY c_custkey) AS keys,
        |       count(*) AS n
        |FROM customer_v71
        |WHERE c_custkey % 199 = 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  val q71Oracle: String =
    """SELECT c_mktsegment,
      |       string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)
      |         AS keys,
      |       count(*) AS n
      |FROM customer
      |WHERE c_custkey % 199 = 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_carry_forward" -> (q70 _),
    "q71_listagg" -> (q71 _))

  val oracles: Map[String, String] = Map(
    "q70_carry_forward" -> q70Oracle,
    "q71_listagg" -> q71Oracle)
}
