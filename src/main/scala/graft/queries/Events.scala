package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Event-stream operators (SURVEY.md §2.3 E7): tumbling-window rollups
  * (q20, the batch twin of the Structured Streaming path in
  * `graft.streaming`) and gap-based sessionization (q31).
  */
object Events {

  // ---------------------------------------------------------------- q20

  /** 1-hour tumbling windows per event type. Batch twin uses
    * `date_trunc` so the DuckDB oracle runs the same SQL; the streaming
    * variant (`window($"ts", "1 hour")` + watermark) is exercised in
    * engine tests.
    *
    * Sums use [[Exact.sumFixed]] (order-independent unscaled-BIGINT
    * sums, emitted unrounded — see Exact's scaladoc): `value` is 2dp
    * data, so group means land mathematically ON .00005 rounding
    * boundaries, where double sum order and round() tie-breaking both
    * diverge across engines (observed here at sf0.1 — the flake that
    * motivated the helper).
    */
  def q20(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_window"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.sumFixed(col("value"), 2).as("sum_value"),
        (Exact.sumFixed(col("value"), 2) / count(lit(1))).as("avg_value"))
      .orderBy(col("hour_window"), col("event_type"))

  val q20Oracle: String =
    s"""SELECT date_trunc('hour', ts) AS hour_window, event_type,
      |       count(*) AS n_events,
      |       ${Exact.sumFixedSql("value", 2)} AS sum_value,
      |       ${Exact.sumFixedSql("value", 2)} / count(*) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q31

  /** Gap-based sessionization: a >30-min silence starts a new session.
    * lag + running sum over a per-user window — the classic pattern;
    * shuffles once on user_id and stays partitioned for both windows
    * and the final per-session aggregate (single exchange reused).
    */
  def q31(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ms")) - min(col("ms"))).as("duration_ms"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q31Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, epoch_ms(ts) AS ms FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts, ms,
      |         lag(ms, 1) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev_ms
      |  FROM e),
      |g AS (
      |  SELECT user_id, event_id, ts, ms,
      |         CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM f),
      |s AS (
      |  SELECT user_id, ms,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_events_tumbling" -> (q20 _),
    "q31_sessionize" -> (q31 _))

  val oracles: Map[String, String] = Map(
    "q20_events_tumbling" -> q20Oracle,
    "q31_sessionize" -> q31Oracle)
}
