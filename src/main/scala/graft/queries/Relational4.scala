package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q38-q40: sketch aggregates (declared oracle-free — HLL++/KLL values
  * are engine-specific by design), the TPC-H Q3 composite shape, and the
  * sliding-window batch twin.
  */
object Relational4 {

  // ---------------------------------------------------------------- q38

  /** E6: approximate sketches per market segment. `approx_count_distinct`
    * (HyperLogLog++) and `percentile_approx` (KLL) cannot hash-match a
    * different engine's sketches, so this query is intentionally ABSENT
    * from `oracleSql` — the driver records the weaker rows-only check,
    * and the accuracy bound is asserted against exact twins in ScalaTest.
    */
  def q38(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        approx_count_distinct(col("c_custkey"), 0.02).as("approx_customers"),
        count(lit(1)).as("exact_rows"),
        percentile_approx(col("c_acctbal"), lit(0.5), lit(1000))
          .as("approx_median_bal"))
      .orderBy(col("c_mktsegment"))

  // ---------------------------------------------------------------- q39

  /** TPC-H Q3 shape (shipping priority): selective filters on both join
    * sides, 3-way join, revenue aggregate, top-10. Catalyst pushes both
    * date filters into the scans; the orders side broadcasts after
    * filtering at this SF, and AQE picks the strategy at larger SFs.
    */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-01-01").cast("timestamp")
    val customer = table(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = table(spark, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
    val lineitem = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= cutoff)
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      // exact fixed-point sum, unrounded: see Exact's scaladoc
      .agg(Exact.sumFixed(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q39Oracle: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
      |       ${Exact.sumFixedSql("l_extendedprice * (1 - l_discount)", 4)}
      |         AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate >= TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q40

  /** Sliding windows in batch: `window(ts, 1h, 30min)` assigns each event
    * to its two overlapping hour windows. The DuckDB twin materializes
    * the same two window starts per event via `unnest`.
    */
  def q40(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(
        window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val q40Oracle: String =
    """WITH w0 AS (
      |  SELECT date_trunc('hour', ts) +
      |           CASE WHEN minute(ts) >= 30
      |                THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
      |           AS ws,
      |         event_type, value
      |  FROM events),
      |assigned AS (
      |  SELECT unnest([ws, ws - INTERVAL 30 MINUTE]) AS window_start,
      |         event_type, value
      |  FROM w0)
      |SELECT window_start, event_type, count(*) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM assigned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_approx_sketches" -> (q38 _),
    "q39_shipping_priority" -> (q39 _),
    "q40_sliding_windows" -> (q40 _))

  val oracles: Map[String, String] = Map(
    "q39_shipping_priority" -> q39Oracle,
    "q40_sliding_windows" -> q40Oracle)
}
