package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}

/** q01-q13: the relational surface the reference delegates to Athena SQL
  * (SURVEY.md §2.2/§2.4), expressed as declarative DataFrame programs so
  * Catalyst supplies pushdown, pruning, join selection, and whole-stage
  * codegen. One function + one DuckDB oracle per query id.
  */
object Relational {

  /** q01: scan + filter + projection + cast. Filter and the two projected
    * columns must reach the parquet scan (PushedFilters / ReadSchema).
    */
  def q01(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q01Oracle: String =
    """SELECT l_orderkey, l_linenumber,
      |       l_extendedprice * (1 - l_discount) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q02: TPC-H Q1-shaped hash aggregate (partial + final via Catalyst).
    *
    * Cross-engine hardening: the discounted-price sum and the discount
    * average use [[Exact.sumFixed]] (order-independent unscaled-BIGINT
    * sums, emitted unrounded — see Exact's scaladoc for the full
    * rationale). Their true values live on grids finer than any
    * presentation rounding (4dp products; a 2dp mean over an arbitrary
    * denominator), so groups land mathematically ON .5·10⁻ᵏ rounding
    * boundaries where double sum order and round() tie-breaking both
    * diverge across engines. sum_qty/avg_qty (integer-valued, exact in
    * double) and sum_base_price (2dp summed, 2dp rounded — the boundary
    * is 0.005 away) cannot straddle and keep the plain double path.
    */
  def q02(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        Exact.sumFixed(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        (Exact.sumFixed(col("l_discount"), 2) / count(lit(1)))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q02Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |       round(sum(l_quantity), 2) AS sum_qty,
       |       round(sum(l_extendedprice), 2) AS sum_base_price,
       |       ${Exact.sumFixedSql("l_extendedprice * (1 - l_discount)", 4)}
       |         AS sum_disc_price,
       |       round(avg(l_quantity), 2) AS avg_qty,
       |       ${Exact.sumFixedSql("l_discount", 2)} / count(*) AS avg_disc,
       |       count(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q03: two-step inner equi-join chain with a selective region filter.
    * nation and region are tiny → Catalyst broadcasts them; the only
    * shuffle left is the final aggregate on n_name.
    */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val customer = table(spark, dir, "customer")
    val nation = table(spark, dir, "nation")
    val region = table(spark, dir, "region")
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("n_name"))
  }

  val q03Oracle: String =
    """SELECT n_name, count(*) AS n_customers,
      |       round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q04: fact ⋈ broadcast dim ⋈ broadcast dim — the canonical star-join
    * shape for 100 TB: lineitem never shuffles for the join, only for the
    * final small aggregate.
    */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = table(spark, dir, "lineitem")
    val supplier = table(spark, dir, "supplier")
    val nation = table(spark, dir, "nation")
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        // exact fixed-point sum, unrounded: see Exact's scaladoc
        Exact.sumFixed(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  val q04Oracle: String =
    s"""SELECT n_name,
      |       ${Exact.sumFixedSql("l_extendedprice * (1 - l_discount)", 4)}
      |         AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q05: left-semi (EXISTS) + left-anti (NOT EXISTS), unioned with a tag.
    * Aggregated so the output stays bounded at any scale factor.
    */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val customer = table(spark, dir, "customer")
    val orderKeys = table(spark, dir, "orders").select(col("o_custkey"))
    val withOrders = customer
      .join(orderKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("tag", lit("with_orders"))
    val withoutOrders = customer
      .join(orderKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("tag", lit("without_orders"))
    withOrders.unionByName(withoutOrders)
      .select(col("c_mktsegment"), col("tag"), col("n_customers"))
      .orderBy(col("c_mktsegment"), col("tag"))
  }

  val q05Oracle: String =
    """SELECT c_mktsegment, 'with_orders' AS tag, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, 'without_orders' AS tag, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment, tag""".stripMargin

  /** q06: bounded theta/range self-join — for each very-high-value order,
    * count same-customer orders in the preceding 90 days. The equi leg
    * (custkey) keeps the join hash-partitionable; the range predicate is
    * post-filtered, so the shuffle stays keyed and skew-safe at scale.
    */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    val orders = table(spark, dir, "orders")
    val hi = orders
      .filter(col("o_totalprice") > 450000)
      .select(
        col("o_orderkey").as("a_orderkey"),
        col("o_custkey").as("a_custkey"),
        col("o_orderdate").as("a_orderdate"))
    val all = orders.select(
      col("o_orderkey").as("b_orderkey"),
      col("o_custkey").as("b_custkey"),
      col("o_orderdate").as("b_orderdate"))
    hi.join(all,
        col("a_custkey") === col("b_custkey") &&
        col("b_orderdate") >= col("a_orderdate") - expr("INTERVAL 90 DAYS") &&
        col("b_orderdate") <= col("a_orderdate") &&
        col("a_orderkey") =!= col("b_orderkey"),
        "left")
      .groupBy(col("a_orderkey"))
      .agg(count(col("b_orderkey")).as("n_prior_orders"))
      .orderBy(col("a_orderkey"))
  }

  val q06Oracle: String =
    """SELECT a.o_orderkey AS a_orderkey, count(b.o_orderkey) AS n_prior_orders
      |FROM orders a
      |LEFT JOIN orders b
      |  ON a.o_custkey = b.o_custkey
      | AND b.o_orderdate >= a.o_orderdate - INTERVAL 90 DAY
      | AND b.o_orderdate <= a.o_orderdate
      | AND a.o_orderkey <> b.o_orderkey
      |WHERE a.o_totalprice > 450000
      |GROUP BY a.o_orderkey ORDER BY a.o_orderkey""".stripMargin

  /** q07: ranking window functions, top-3 orders per customer. */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_totalprice"),
        col("rn").cast("long").as("rn"),
        col("rk").cast("long").as("rk"),
        col("drk").cast("long").as("drk"))
      .orderBy(col("o_custkey"), col("rn"), col("o_orderkey"))
  }

  val q07Oracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       rn, rk, drk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER w AS rn,
      |         rank() OVER w AS rk,
      |         dense_rank() OVER w AS drk
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_totalprice DESC, o_orderkey))
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn, o_orderkey""".stripMargin

  /** q08: analytic frames — running sum over an explicit ROWS frame plus
    * lag/lead, restricted to one deterministic slice of customers so the
    * output is bounded.
    *
    * The running total accumulates in integer CENTS (the standing
    * `floor(x·100 + 0.5)` quantization), not double: a double window sum
    * is only bit-stable while both engines associate identically, and
    * DuckDB's windowed-aggregate segment tree re-chunks as row count
    * grows — at sf1 (10x rows, identical values) three rows diverged in
    * the 17th digit. Int64 cents are associativity-free at any scale;
    * budget: |Σ| < 2⁶³ holds to ~10¹⁴ orders per customer. lag/lead
    * pass raw doubles through untouched (no accumulation), so they stay
    * doubles.
    */
  def q08(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    table(spark, dir, "orders")
      .filter(col("o_custkey") % 50 === 0)
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
      .withColumn("running_cents",
        sum(col("cents"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("running_cents"), col("prev_price"), col("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q08Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |           OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS running_cents,
      |       lag(o_totalprice, 1) OVER w AS prev_price,
      |       lead(o_totalprice, 1) OVER w AS next_price
      |FROM orders
      |WHERE o_custkey % 50 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q09: global top-k — Spark plans sort+limit as TakeOrderedAndProject
    * (per-partition top-k, then driver merge: no full sort at scale).
    * Rounding happens before the sort so tie-breaks are engine-agnostic.
    */
  def q09(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  val q09Oracle: String =
    """SELECT l_orderkey, l_linenumber,
      |       l_extendedprice * (1 - l_discount) AS revenue
      |FROM lineitem
      |ORDER BY revenue DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  /** q10: UNION ALL / INTERSECT / EXCEPT over customer-key slices. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    val customer = table(spark, dir, "customer")
    val building = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val rich = customer.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val auto = customer.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    val richBuilding = building.intersect(rich)
      .withColumn("tag", lit("rich_building"))
    val poorAuto = auto.except(rich)
      .withColumn("tag", lit("auto_not_rich"))
    richBuilding.unionByName(poorAuto)
      .select(col("tag"), col("c_custkey"))
      .orderBy(col("tag"), col("c_custkey"))
  }

  val q10Oracle: String =
    """SELECT 'rich_building' AS tag, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |UNION ALL
      |SELECT 'auto_not_rich' AS tag, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |  EXCEPT
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |ORDER BY tag, c_custkey""".stripMargin

  /** q11: per-month exact distinct-count (oracle twin); the engine also
    * supports `approx_count_distinct` (HLL++) — exercised in ScalaTest,
    * kept out of the hash-compared output because sketches are not
    * cross-engine deterministic.
    */
  def q11(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("month"))

  val q11Oracle: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |       count(DISTINCT o_custkey) AS n_customers,
      |       count(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** q12: ROLLUP with grouping() flags; explicit NULLS FIRST ordering
    * because Spark and DuckDB default null order differently.
    */
  def q12(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        // exact fixed-point sum, unrounded: see Exact's scaladoc
        Exact.sumFixed(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(
        col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q12Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
      |       ${Exact.sumFixedSql("l_extendedprice * (1 - l_discount)", 4)}
      |         AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status,
      |         l_returnflag ASC NULLS FIRST,
      |         l_linestatus ASC NULLS FIRST""".stripMargin

  /** q13: scalar-function gauntlet (string/date/math) over orders. */
  def q13(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        upper(col("o_orderstatus")).as("status_u"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority"))
          .as("status_prio"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        regexp_extract(col("o_orderpriority"), "([0-9]+)", 1)
          .as("prio_digit"),
        date_trunc("quarter", col("o_orderdate")).as("order_quarter"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        (col("o_totalprice") / 1000).as("price_k"),
        abs(col("o_totalprice") - 200000).as("price_dist"),
        (col("o_orderkey") % 7).cast("long").as("key_mod"))
      .orderBy(col("o_orderkey"))

  val q13Oracle: String =
    """SELECT o_orderkey,
      |       substr(o_orderpriority, 1, 1) AS prio_code,
      |       upper(o_orderstatus) AS status_u,
      |       concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
      |       CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
      |       regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_digit,
      |       date_trunc('quarter', o_orderdate) AS order_quarter,
      |       year(o_orderdate) AS order_year,
      |       month(o_orderdate) AS order_month,
      |       o_totalprice / 1000 AS price_k,
      |       abs(o_totalprice - 200000) AS price_dist,
      |       CAST(o_orderkey % 7 AS BIGINT) AS key_mod
      |FROM orders
      |WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q62

  /** Positional window functions q07/q08 don't cover: first_value,
    * last_value and nth_value — last/nth over the FULL frame (the
    * default running frame makes last_value just the current row, the
    * classic trap). Values are picked, not computed, so they stay raw.
    */
  def q62(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v62")(
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       last_value(o_totalprice) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS last_price,
        |       nth_value(o_totalprice, 2) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS second_price
        |FROM orders_v62
        |WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)

  val q62Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       first_value(o_totalprice) OVER w AS first_price,
      |       last_value(o_totalprice) OVER
      |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |         AS last_price,
      |       nth_value(o_totalprice, 2) OVER
      |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |         AS second_price
      |FROM orders
      |WHERE o_custkey % 100 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> (q01 _),
    "q02_agg_group" -> (q02 _),
    "q03_join_inner_multi" -> (q03 _),
    "q04_join_broadcast" -> (q04 _),
    "q05_join_semi_anti" -> (q05 _),
    "q06_join_theta_range" -> (q06 _),
    "q07_window_rank" -> (q07 _),
    "q08_window_frame" -> (q08 _),
    "q09_sort_limit_topk" -> (q09 _),
    "q10_set_ops" -> (q10 _),
    "q11_distinct_count" -> (q11 _),
    "q12_rollup" -> (q12 _),
    "q13_scalar_gauntlet" -> (q13 _),
    "q62_window_positional" -> (q62 _))

  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" -> q01Oracle,
    "q02_agg_group" -> q02Oracle,
    "q03_join_inner_multi" -> q03Oracle,
    "q04_join_broadcast" -> q04Oracle,
    "q05_join_semi_anti" -> q05Oracle,
    "q06_join_theta_range" -> q06Oracle,
    "q07_window_rank" -> q07Oracle,
    "q08_window_frame" -> q08Oracle,
    "q09_sort_limit_topk" -> q09Oracle,
    "q10_set_ops" -> q10Oracle,
    "q11_distinct_count" -> q11Oracle,
    "q12_rollup" -> q12Oracle,
    "q13_scalar_gauntlet" -> q13Oracle,
    "q62_window_positional" -> q62Oracle)
}
