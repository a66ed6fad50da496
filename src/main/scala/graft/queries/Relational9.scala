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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_regression_agg" -> (q79 _),
    "q80_hof_gauntlet" -> (q80 _),
    "q81_datetime_gauntlet" -> (q81 _))

  val oracles: Map[String, String] = Map(
    "q79_regression_agg" -> q79Oracle,
    "q80_hof_gauntlet" -> q80Oracle,
    "q81_datetime_gauntlet" -> q81Oracle)
}
