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
    * Sums go through DECIMAL(18,6), UNROUNDED: double summation is
    * order-dependent in the last ULP and each engine sums groups in its
    * own parallel order, so `round(avg(value), 4)` flaked whenever a
    * group's mean landed mathematically ON a .00005 boundary (2dp data
    * makes that common — observed at sf0.1). Worse, round() itself
    * diverges there even on IDENTICAL inputs: Spark rounds the exact
    * binary expansion (HALF_UP) while DuckDB multiplies by 10^k first,
    * which can snap onto the .5 and round the other way. Decimal
    * addition is exact and order-independent, so both engines cast the
    * SAME exact sum to double and divide by the same count — the raw
    * quotient is bit-identical cross-engine and needs no rounding at
    * all. (`value` carries 2 decimal digits, so the 6-digit
    * quantization is nowhere near a tie.)
    */
  def q20(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_window"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_dec"))
      .select(
        col("hour_window"), col("event_type"), col("n_events"),
        col("sum_dec").cast("double").as("sum_value"),
        (col("sum_dec").cast("double") / col("n_events")).as("avg_value"))
      .orderBy(col("hour_window"), col("event_type"))

  val q20Oracle: String =
    """SELECT date_trunc('hour', ts) AS hour_window, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
      |         AS sum_value,
      |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
      |         AS avg_value
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
