package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}

/** q44-q45: time-range window frames and explicit GROUPING SETS —
  * the two window/grouping shapes q08/q12 don't cover.
  */
object Relational5 {

  // ---------------------------------------------------------------- q44

  /** RANGE frame over event time: per-customer order count and spend in
    * the trailing 90 days of each order. Interval-based RANGE frames are
    * only expressible through SQL in Spark (the DataFrame `rangeBetween`
    * takes numerics), so this goes through `spark.sql` — same text shape
    * as the DuckDB twin.
    */
  def q44(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v44")(
      """SELECT o_custkey, o_orderkey,
        |       count(*) OVER w AS trailing_n,
        |       round(sum(o_totalprice) OVER w, 2) AS trailing_spend
        |FROM orders_v44
        |WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |             RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)

  val q44Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       count(*) OVER w AS trailing_n,
      |       round(sum(o_totalprice) OVER w, 2) AS trailing_spend
      |FROM orders
      |WHERE o_custkey % 100 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q45

  /** Explicit GROUPING SETS mixing two independent single-column
    * groupings plus the grand total — not expressible as one ROLLUP/CUBE.
    */
  def q45(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "lineitem" -> "lineitem_v45")(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       count(*) AS n_items
        |FROM lineitem_v45
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status,
        |         l_returnflag ASC NULLS FIRST,
        |         l_linestatus ASC NULLS FIRST""".stripMargin)

  val q45Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       count(*) AS n_items
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY g_flag, g_status,
      |         l_returnflag ASC NULLS FIRST,
      |         l_linestatus ASC NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_range_frame" -> (q44 _),
    "q45_grouping_sets" -> (q45 _))

  val oracles: Map[String, String] = Map(
    "q44_range_frame" -> q44Oracle,
    "q45_grouping_sets" -> q45Oracle)
}
