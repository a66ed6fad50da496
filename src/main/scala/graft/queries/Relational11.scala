package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q138-q139: the per-group-threshold decision-support archetypes —
  * TPC-H Q17's "below a fraction of the group's own average"
  * correlated filter, and the dominant-supplier share screen (the
  * per-group twin of q133's global-share test). Reference scope: the
  * reference delegates its query surface to Athena SQL (SURVEY.md
  * §2.2); correlated per-group thresholds are core to that surface.
  *
  * Round-6 discipline: quantities and revenues are exact unscaled
  * integers before any aggregation, every threshold compare is an
  * integer cross-multiplication (never a division), and every output
  * ends in a total ORDER BY.
  */
object Relational11 {

  // ---------------------------------------------------------------- q138

  /** Small-quantity line revenue per return flag (TPC-H Q17 archetype):
    * revenue carried by lineitems whose quantity is below one fifth of
    * their part's average quantity — the correlated-aggregate-threshold
    * shape, decided by the exact integer cross-multiplication
    * `5·qty·cnt_p < sum_qty_p` (equivalent to `qty < avg/5` with no
    * division and no float).
    *
    * Scale shape — the reason the rewrite matters: the textbook
    * spelling re-aggregates lineitem per correlated row (or self-joins
    * corpus-to-aggregate). Here both per-part aggregates ride ONE
    * window over ONE lineitem scan — the corpus shuffles once on
    * l_partkey and every downstream step (filter, returnflag rollup)
    * is narrow. The oracle keeps the literal correlated-subquery
    * spelling, so the hash gate proves the decorrelation.
    */
  def q138(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_returnflag"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(10000.0) + lit(0.5)).cast("long").as("rev_u4"))
      .withColumn("cnt_p", count(lit(1)).over(w))
      .withColumn("sum_qty_p", sum(col("qty")).over(w))
      .filter(lit(5L) * col("qty") * col("cnt_p") < col("sum_qty_p"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum(col("rev_u4")).as("rev_u4_total"))
      .orderBy(col("l_returnflag"))
  }

  val q138Oracle: String =
    """WITH l AS (
      |  SELECT l_partkey, l_returnflag,
      |         CAST(l_quantity AS BIGINT) AS qty,
      |         CAST(floor(l_extendedprice * (1.0 - l_discount)
      |                    * 10000.0 + 0.5) AS BIGINT) AS rev_u4
      |  FROM lineitem)
      |SELECT l_returnflag, count(*) AS n_rows,
      |       CAST(sum(rev_u4) AS BIGINT) AS rev_u4_total
      |FROM l
      |WHERE 5 * qty * (SELECT count(*) FROM l l2
      |                 WHERE l2.l_partkey = l.l_partkey)
      |      < (SELECT CAST(sum(qty) AS BIGINT) FROM l l2
      |         WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q139

  /** A (part, supplier) pair is dominant when the supplier ships more
    * than [[DominanceNum]]× the part's fair per-supplier share —
    * `qty_sp · n_supp > 3 · qty_p`. Share-relative (not an absolute
    * quantity), so the predicate needs no re-tuning as both sides grow
    * with SF — the q133 scale-invariance argument per group.
    */
  val DominanceNum = 3

  /** Dominant suppliers per part: supply concentration screening — the
    * per-group version of q133's global revenue-share test, and the
    * aggregation-then-window shape (totals of an aggregate belong in a
    * window OVER the aggregate, the q114 lesson).
    *
    * Scale shape: the corpus shuffles once into the (part, supplier)
    * aggregate WITH map-side partial combine — the shuffle carries
    * combined partial sums, not raw rows. The part-total window then
    * reshuffles only the aggregated pair frame (bounded by distinct
    * pairs, orders of magnitude below the corpus). Deliberately NOT
    * pre-partitioned by part alone: that would satisfy both
    * clusterings in one exchange but ship every raw row uncombined —
    * worse at 100 TB than two shuffles whose second is tiny. Output is
    * the top-100 by share under a total order.
    */
  def q139(spark: SparkSession, dir: String): DataFrame = {
    val pairQty = table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("qty_sp"))
    val w = Window.partitionBy(col("l_partkey"))
    pairQty
      .withColumn("qty_p", sum(col("qty_sp")).over(w))
      .withColumn("n_supp", count(lit(1)).over(w))
      .filter(col("n_supp") >= 2 &&
        col("qty_sp") * col("n_supp") > lit(DominanceNum.toLong) * col("qty_p"))
      .select(col("l_partkey"), col("l_suppkey"), col("qty_sp"),
        col("n_supp"), expr("(1000 * qty_sp) div qty_p").as("share_permille"))
      .orderBy(col("share_permille").desc, col("l_partkey"), col("l_suppkey"))
      .limit(100)
  }

  val q139Oracle: String =
    s"""WITH ps AS (
       |  SELECT l_partkey, l_suppkey,
       |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sp
       |  FROM lineitem GROUP BY l_partkey, l_suppkey),
       |w AS (
       |  SELECT l_partkey, l_suppkey, qty_sp,
       |         CAST(sum(qty_sp) OVER (PARTITION BY l_partkey) AS BIGINT)
       |           AS qty_p,
       |         count(*) OVER (PARTITION BY l_partkey) AS n_supp
       |  FROM ps)
       |SELECT l_partkey, l_suppkey, qty_sp, n_supp,
       |       CAST((1000 * qty_sp) // qty_p AS BIGINT) AS share_permille
       |FROM w
       |WHERE n_supp >= 2 AND qty_sp * n_supp > $DominanceNum * qty_p
       |ORDER BY share_permille DESC, l_partkey, l_suppkey
       |LIMIT 100""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_small_qty_revenue" -> (q138 _),
    "q139_dominant_supplier" -> (q139 _))

  val oracles: Map[String, String] = Map(
    "q138_small_qty_revenue" -> q138Oracle,
    "q139_dominant_supplier" -> q139Oracle)
}
