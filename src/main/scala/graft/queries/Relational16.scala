package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}

/** q183-q184: market-basket affinity and robust location estimates —
  * two classic retail-analytics archetypes the TPC-H matrix (q148-q155)
  * doesn't cover.
  *
  *  - q183 basket lift: part pairs co-ordered in the same order, scored
  *    by lift = P(a,b)/(P(a)P(b)) (Agrawal/Srikant association-rule
  *    support×lift, permille-exact integers). The self-join fans out
  *    per order by C(basket,2) — TPC-H baskets are ≤7 lines, so the
  *    pair frame is ≤21× lineitem and the join key (orderkey) is the
  *    table's native clustering: one co-partitioned shuffle, no skew
  *    (every basket is small by schema). Per-part counts join back
  *    BROADCAST (part domain ≪ fact table); the global order count is
  *    a broadcast scalar. Top-50 under a total (pair_n DESC, keys)
  *    order → TakeOrderedAndProject, never a full sort.
  *  - q184 trimmed + winsorized mean of order value per nation (10%
  *    each tail): rank-based, in integer cents — the robust-statistics
  *    companion to q137's MAD outliers. One window pass per nation;
  *    nation cardinality bounds the partition count, order rows per
  *    nation bound the frame (the q33 percentile argument).
  *
  * Overflow bounds: q183's lift numerator pair_n·n_orders ≤ n_orders²
  * < 9·10¹⁸ while n_orders < 3·10⁹ (TPC-H SF ≈ 2000); q184 sums cents
  * (≤6·10⁷ per order) over per-nation order counts — int64-safe below
  * 10¹¹ orders/nation.
  */
object Relational16 {

  // ---------------------------------------------------------------- q183

  /** q183: top-50 co-ordered part pairs with support and lift. */
  def q183(spark: SparkSession, dir: String): DataFrame = {
    val items = table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()
    val nOrders = items.select(col("okey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val perPart = items.groupBy(col("pkey")).agg(count(lit(1)).as("n_p"))
    val a = items.toDF("okey_a", "pk_a")
    val b = items.toDF("okey_b", "pk_b")
    a.join(b, col("okey_a") === col("okey_b") && col("pk_a") < col("pk_b"))
      .groupBy(col("pk_a"), col("pk_b"))
      .agg(count(lit(1)).as("pair_n"))
      .join(broadcast(perPart.toDF("pk_a", "n_a")), "pk_a")
      .join(broadcast(perPart.toDF("pk_b", "n_b")), "pk_b")
      .crossJoin(broadcast(nOrders))
      .select(col("pk_a"), col("pk_b"), col("pair_n"), col("n_a"),
        col("n_b"),
        expr("1000 * pair_n * n_orders DIV (n_a * n_b)")
          .as("lift_permille"))
      .orderBy(col("pair_n").desc, col("pk_a"), col("pk_b"))
      .limit(50)
  }

  val q183Oracle: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
      |  FROM lineitem),
      |n_o AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
      |pp AS (SELECT pkey, count(*) AS n_p FROM items GROUP BY pkey),
      |pairs AS (
      |  SELECT a.pkey AS pk_a, b.pkey AS pk_b, count(*) AS pair_n
      |  FROM items a JOIN items b
      |    ON a.okey = b.okey AND a.pkey < b.pkey
      |  GROUP BY a.pkey, b.pkey)
      |SELECT pk_a, pk_b, CAST(pair_n AS BIGINT) AS pair_n,
      |       CAST(pa.n_p AS BIGINT) AS n_a, CAST(pb.n_p AS BIGINT) AS n_b,
      |       CAST(1000 * pair_n * n_orders // (pa.n_p * pb.n_p) AS BIGINT)
      |         AS lift_permille
      |FROM pairs JOIN pp pa ON pa.pkey = pk_a
      |JOIN pp pb ON pb.pkey = pk_b CROSS JOIN n_o
      |ORDER BY pair_n DESC, pk_a, pk_b LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q184

  /** q184: 10%-trimmed and winsorized mean order value per nation, in
    * integer cents (rank-based clamp, deterministic (cents, orderkey)
    * order). Small-n groups degrade gracefully: k = n DIV 10 = 0 makes
    * both estimates the plain mean.
    */
  def q184(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v184",
      "customer" -> "customer_v184", "nation" -> "nation_v184")(
      """WITH o AS (
        |  SELECT n_name,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |         o_orderkey
        |  FROM orders_v184
        |  JOIN customer_v184 ON o_custkey = c_custkey
        |  JOIN nation_v184 ON c_nationkey = n_nationkey),
        |r AS (
        |  SELECT n_name, cents,
        |         row_number() OVER (PARTITION BY n_name
        |                            ORDER BY cents, o_orderkey) AS rn,
        |         count(*) OVER (PARTITION BY n_name) AS n
        |  FROM o),
        |t AS (
        |  SELECT n_name, max(n) AS n, max(n DIV 10) AS k,
        |         sum(CASE WHEN rn > n DIV 10 AND rn <= n - n DIV 10
        |                  THEN cents END) AS trim_sum,
        |         count(CASE WHEN rn > n DIV 10 AND rn <= n - n DIV 10
        |                    THEN 1 END) AS trim_n,
        |         min(CASE WHEN rn = n DIV 10 + 1 THEN cents END) AS lo,
        |         min(CASE WHEN rn = n - n DIV 10 THEN cents END) AS hi
        |  FROM r GROUP BY n_name)
        |SELECT n_name, CAST(n AS BIGINT) AS n_orders,
        |       CAST(k AS BIGINT) AS k_trim,
        |       CAST(trim_sum DIV trim_n AS BIGINT) AS trimmed_mean_cents,
        |       CAST((trim_sum + k * lo + k * hi) DIV n AS BIGINT)
        |         AS winsor_mean_cents
        |FROM t ORDER BY n_name""".stripMargin)

  val q184Oracle: String =
    """WITH o AS (
      |  SELECT n_name, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
      |         o_orderkey
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |r AS (
      |  SELECT n_name, cents,
      |         row_number() OVER (PARTITION BY n_name
      |                            ORDER BY cents, o_orderkey) AS rn,
      |         count(*) OVER (PARTITION BY n_name) AS n
      |  FROM o),
      |t AS (
      |  SELECT n_name, max(n) AS n, max(n // 10) AS k,
      |         sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
      |                  THEN cents END) AS trim_sum,
      |         count(CASE WHEN rn > n // 10 AND rn <= n - n // 10
      |                    THEN 1 END) AS trim_n,
      |         min(CASE WHEN rn = n // 10 + 1 THEN cents END) AS lo,
      |         min(CASE WHEN rn = n - n // 10 THEN cents END) AS hi
      |  FROM r GROUP BY n_name)
      |SELECT n_name, CAST(n AS BIGINT) AS n_orders,
      |       CAST(k AS BIGINT) AS k_trim,
      |       CAST(trim_sum // trim_n AS BIGINT) AS trimmed_mean_cents,
      |       CAST((trim_sum + k * lo + k * hi) // n AS BIGINT)
      |         AS winsor_mean_cents
      |FROM t ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q187

  /** q187: rolling 7-day exact median of daily revenue per order
    * priority — the windowed-median archetype (no native windowed
    * percentile in either engine's shared surface): collect the ≤7-row
    * ROWS frame, sort it, take the middle pair under floor-average so
    * the result stays integer cents. The frame is bounded by the
    * LITERAL 7, and the windowed input is the (priority × day) daily
    * aggregate — time-domain-sized, never the fact table; the corpus-
    * scale work is the one partial-aggregated groupBy producing it.
    */
  def q187(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("day")).rowsBetween(-6, 0)
    table(spark, dir, "orders")
      .groupBy(col("o_orderpriority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("rev_cents"))
      .withColumn("arr", sort_array(collect_list(col("rev_cents")).over(w)))
      .select(col("o_orderpriority"), col("day"), col("rev_cents"),
        size(col("arr")).cast("long").as("n_days_in_frame"),
        expr("(element_at(arr, int((size(arr) + 1) DIV 2)) +" +
          " element_at(arr, int(size(arr) DIV 2 + 1))) DIV 2")
          .as("rolling_median_cents"))
      .orderBy(col("o_orderpriority"), col("day"))
  }

  val q187Oracle: String =
    """WITH daily AS (
      |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
      |         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
      |           AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY o_orderpriority, day),
      |fr AS (
      |  SELECT o_orderpriority, day, rev_cents,
      |         list_sort(array_agg(rev_cents) OVER
      |           (PARTITION BY o_orderpriority ORDER BY day
      |            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
      |  FROM daily)
      |SELECT o_orderpriority, day, rev_cents,
      |       CAST(len(arr) AS BIGINT) AS n_days_in_frame,
      |       CAST((arr[(len(arr) + 1) // 2] + arr[len(arr) // 2 + 1]) // 2
      |         AS BIGINT) AS rolling_median_cents
      |FROM fr ORDER BY o_orderpriority, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_basket_lift" -> (q183 _),
    "q184_trimmed_stats" -> (q184 _),
    "q187_rolling_median" -> (q187 _))

  val oracles: Map[String, String] = Map(
    "q183_basket_lift" -> q183Oracle,
    "q184_trimmed_stats" -> q184Oracle,
    "q187_rolling_median" -> q187Oracle)
}
