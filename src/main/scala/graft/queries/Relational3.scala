package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}

/** q36-q37: operators beyond plain joins/aggregates — an as-of join
  * (composed from built-ins per the custom-operator preference order:
  * no custom SparkPlan needed) and a correlated scalar subquery through
  * the SQL entry path (exercising Catalyst decorrelation).
  */
object Relational3 {

  // ---------------------------------------------------------------- q36

  /** As-of join: for every `purchase` event, the most recent prior
    * `click` of the same user. Composed as one pass — running
    * `max(click_ts)` over an ordered per-user window, filtered to
    * purchases — instead of a range self-join: one shuffle on user_id,
    * no quadratic blow-up, the scalable shape for event attribution at
    * 100 TB.
    */
  def q36(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "events")
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("last_click_ms",
        max(when(col("event_type") === "click", col("ms"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("ms").as("purchase_ms"),
        col("last_click_ms"),
        (col("ms") - col("last_click_ms")).as("ms_since_click"))
      .orderBy(col("event_id"))
  }

  val q36Oracle: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, ts, epoch_ms(ts) AS ms
      |  FROM events),
      |attributed AS (
      |  SELECT event_id, user_id, event_type, ms,
      |         max(CASE WHEN event_type = 'click' THEN ms END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS last_click_ms
      |  FROM e)
      |SELECT event_id, user_id, ms AS purchase_ms, last_click_ms,
      |       ms - last_click_ms AS ms_since_click
      |FROM attributed WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q37

  /** Correlated scalar subquery through `spark.sql` — Catalyst
    * decorrelates it into an aggregate + join, which is exactly what a
    * hand-written rewrite would do; declared SQL keeps that optimization
    * Catalyst's job.
    */
  def q37(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v")(
      """SELECT o_custkey, count(*) AS n_above_personal_avg
        |FROM orders_v o
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
        |                            FROM orders_v i
        |                            WHERE i.o_custkey = o.o_custkey)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin)

  val q37Oracle: String =
    """SELECT o_custkey, count(*) AS n_above_personal_avg
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice)
      |                            FROM orders i
      |                            WHERE i.o_custkey = o.o_custkey)
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_asof_join" -> (q36 _),
    "q37_correlated_subquery" -> (q37 _))

  val oracles: Map[String, String] = Map(
    "q36_asof_join" -> q36Oracle,
    "q37_correlated_subquery" -> q37Oracle)
}
