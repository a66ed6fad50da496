package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}

/** q79-q81: round-3 surface widening — linear-regression aggregates,
  * the array lambda-HOF family, and a datetime-function gauntlet.
  */
object Relational9 {

  // ---------------------------------------------------------------- q79

  /** Linear-regression aggregates (regr_slope/intercept/r2/count +
    * regr_avgx/avgy) of extended price against quantity per return
    * flag — the OLS family both engines ship natively. Slope/intercept
    * round at 4dp and r² at 6dp: the engines accumulate moments with
    * different (numerically stable) update formulas, so agreement is
    * statistical (~√n·ε relative), not bit-exact; the rounding scales
    * leave ≫10³ margin over the expected divergence. avgx is an
    * integer mean (exact in double on both sides, see Exact's
    * scaladoc) and stays raw.
    */
  def q79(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "lineitem" -> "lineitem_v79")(
      """SELECT l_returnflag,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
        |         AS n_pairs,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4)
        |         AS intercept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       regr_avgx(l_extendedprice, l_quantity) AS avg_x
        |FROM lineitem_v79
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)

  val q79Oracle: String =
    """SELECT l_returnflag,
      |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
      |         AS n_pairs,
      |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |       round(regr_intercept(l_extendedprice, l_quantity), 4)
      |         AS intercept,
      |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |       regr_avgx(l_extendedprice, l_quantity) AS avg_x
      |FROM lineitem
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q80

  /** Array lambda HOFs — filter/transform/aggregate (fold) plus the
    * membership/extremum array functions — over whitespace tokens. All
    * outputs are exact integers, so no float determinism concerns; the
    * fold is spelled as each engine's idiom (Spark `aggregate`, DuckDB
    * `list_aggregate(list_transform(...), 'sum')`) because integer
    * arithmetic is order-independent. Zero-shuffle narrow projection —
    * the 100 TB shape for per-document feature extraction. DuckDB's
    * empty-list sum is NULL (Spark folds to the seed 0), hence the
    * oracle-side coalesce; array_max of an empty filter result is NULL
    * on both engines and pinned to 0.
    */
  def q80(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "documents" -> "documents_v80")(
      """SELECT doc_id,
        |  CAST(size(split(lower(text), ' ')) AS BIGINT) AS n_tokens,
        |  CAST(size(filter(split(lower(text), ' '), t -> length(t) >= 4))
        |       AS BIGINT) AS n_long,
        |  CAST(aggregate(filter(split(lower(text), ' '),
        |                        t -> length(t) >= 4),
        |                 0, (a, t) -> a + length(t)) AS BIGINT)
        |    AS long_char_sum,
        |  CAST(coalesce(array_max(transform(
        |         filter(split(lower(text), ' '), t -> length(t) >= 4),
        |         t -> length(t))), 0) AS BIGINT) AS max_long_len,
        |  CAST(array_contains(split(lower(text), ' '), 'the') AS INT)
        |    AS has_the
        |FROM documents_v80 ORDER BY doc_id""".stripMargin)

  val q80Oracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(string_split(lower(text), ' '),
      |                       t -> length(t) >= 4)) AS BIGINT) AS n_long,
      |  CAST(coalesce(list_aggregate(
      |         list_transform(list_filter(string_split(lower(text), ' '),
      |                                    t -> length(t) >= 4),
      |                        t -> length(t)), 'sum'), 0) AS BIGINT)
      |    AS long_char_sum,
      |  CAST(coalesce(list_max(list_transform(
      |         list_filter(string_split(lower(text), ' '),
      |                     t -> length(t) >= 4),
      |         t -> length(t))), 0) AS BIGINT) AS max_long_len,
      |  CAST(list_contains(string_split(lower(text), ' '), 'the') AS INT)
      |    AS has_the
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q81

  /** Datetime-function gauntlet: last_day, add_months (end-of-month
    * clamping), day arithmetic, datediff against an epoch, and the
    * dow/doy/week/quarter extraction family. Cross-engine pins: Spark's
    * dayofweek is 1-based Sunday-first while DuckDB's is 0-based
    * (oracle adds 1); datediff is INT in Spark and BIGINT in DuckDB
    * (both cast); all date results compare as DATE.
    */
  def q81(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v81")(
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS d,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       add_months(CAST(o_orderdate AS DATE), 2) AS plus2m,
        |       date_add(CAST(o_orderdate AS DATE), 45) AS plus45d,
        |       CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')
        |            AS BIGINT) AS days_since,
        |       CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
        |       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS q
        |FROM orders_v81 WHERE o_orderkey % 50 = 0
        |ORDER BY o_orderkey""".stripMargin)

  val q81Oracle: String =
    """SELECT o_orderkey,
      |       CAST(o_orderdate AS DATE) AS d,
      |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
      |         AS plus2m,
      |       CAST(o_orderdate AS DATE) + 45 AS plus45d,
      |       CAST(date_diff('day', DATE '1995-01-01',
      |                      CAST(o_orderdate AS DATE)) AS BIGINT)
      |         AS days_since,
      |       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      |       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
      |       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
      |       CAST(quarter(o_orderdate) AS BIGINT) AS q
      |FROM orders WHERE o_orderkey % 50 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q131

  /** Days after the order date a line may ship before counting late. */
  val LateDays = 60

  /** Suppliers reported by q131. */
  val WaitingTop = 20

  /** TPC-H Q21's nested-quantifier archetype (sole-blame late
    * suppliers), adapted to this corpus's columns: a supplier is
    * charged for an order when its line shipped more than [[LateDays]]
    * days after the order date, ANOTHER supplier also has a line on the
    * same order (EXISTS), and NO other supplier on that order was also
    * late (NOT EXISTS). The Spark formulation is the idiomatic one:
    * EXISTS → `left_semi`, NOT EXISTS → `left_anti`, both on the
    * co-partitioned 8-byte orderkey — no correlated subquery is
    * re-executed per row, which is exactly how the archetype should be
    * planned at 100 TB. The oracle keeps the literal EXISTS/NOT EXISTS
    * spelling, so the gate also proves the join rewrite IS the
    * quantifier semantics.
    */
  def q131(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = li
      .join(table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $LateDays DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l1 = late.as("l1")
    val others = li.select(col("l_orderkey").as("o_key"),
      col("l_suppkey").as("o_supp"))
    val blamed = l1
      .join(others,
        col("l1.l_orderkey") === col("o_key") &&
          col("l1.l_suppkey") =!= col("o_supp"), "left_semi")
      .join(late.select(col("l_orderkey").as("x_key"),
          col("l_suppkey").as("x_supp")),
        col("l1.l_orderkey") === col("x_key") &&
          col("l1.l_suppkey") =!= col("x_supp"), "left_anti")
      .select(col("l1.l_orderkey").as("orderkey"),
        col("l1.l_suppkey").as("suppkey"))
      .distinct()
    blamed
      .join(broadcast(table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(WaitingTop)
  }

  val q131Oracle: String =
    s"""WITH late AS (
       |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
       |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
       |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL $LateDays DAY),
       |blamed AS (
       |  SELECT l1.l_orderkey, l1.l_suppkey
       |  FROM late l1
       |  WHERE EXISTS (
       |      SELECT 1 FROM lineitem l2
       |      WHERE l2.l_orderkey = l1.l_orderkey
       |        AND l2.l_suppkey <> l1.l_suppkey)
       |    AND NOT EXISTS (
       |      SELECT 1 FROM late l3
       |      WHERE l3.l_orderkey = l1.l_orderkey
       |        AND l3.l_suppkey <> l1.l_suppkey))
       |SELECT s.s_name, count(*) AS numwait
       |FROM blamed b JOIN supplier s ON s.s_suppkey = b.l_suppkey
       |GROUP BY s.s_name
       |ORDER BY numwait DESC, s.s_name LIMIT $WaitingTop""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_regression_agg" -> (q79 _),
    "q80_hof_gauntlet" -> (q80 _),
    "q81_datetime_gauntlet" -> (q81 _),
    "q131_waiting_suppliers" -> (q131 _))

  val oracles: Map[String, String] = Map(
    "q79_regression_agg" -> q79Oracle,
    "q80_hof_gauntlet" -> q80Oracle,
    "q81_datetime_gauntlet" -> q81Oracle,
    "q131_waiting_suppliers" -> q131Oracle)
}
