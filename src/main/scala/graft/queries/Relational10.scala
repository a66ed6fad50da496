package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q132-q134: the three classic TPC-H decision-support archetypes the
  * surface did not yet exercise as whole shapes — Q22 (global scalar
  * threshold + anti-join + rollup), Q11 (group HAVING against a global
  * fraction of the same aggregate), and Q15 (join-on-global-max with
  * ties kept). Reference scope: the reference delegates its entire
  * query surface to Athena SQL (SURVEY.md §2.2), and these are the
  * canonical scalar-subquery shapes that surface supports.
  *
  * Round-6 discipline: every monetary value is quantized to its exact
  * fixed-point unscaled integer BEFORE any aggregation
  * (`floor(x·10^s + 0.5)` — the [[Exact]] op sequence, identical IEEE
  * ops on both engines), so every sum, threshold compare, and rank key
  * is BIGINT and order-independent. No float ever decides a row.
  */
object Relational10 {

  // ---------------------------------------------------------------- q132

  /** Every customer in this corpus has at least one order, so "dormant"
    * is temporal: no order on or after this cutoff (late in the
    * 1995–2001 order span — splits the population at every SF).
    */
  val DormantCutoff = "2000-01-01"

  /** Dormant high-balance customers (TPC-H Q22 archetype): customers
    * whose account balance exceeds the global average positive balance
    * AND who have placed no order since [[DormantCutoff]], rolled up
    * per nation.
    *
    * Shapes under test: an uncorrelated scalar aggregate consumed as a
    * filter threshold (1-row broadcast cross-join — the declared BNLJ
    * pattern, q19/q97 precedent), a left-anti join against a
    * date-filtered fact table, and a small-dimension broadcast rollup.
    *
    * Scale shape: customer scans once; the anti-join's right side
    * prunes to the key column AND pushes the recency predicate into
    * the parquet scan (both pinned by ArchetypePackSpec); nation
    * broadcasts. The threshold is integer cents: `sum(cents) div n`
    * over positive balances — exact, so both engines pick the
    * identical customer set even when a balance sits one cent off the
    * mean.
    */
  def q132(spark: SparkSession, dir: String): DataFrame = {
    val cust = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"))
    val thr = cust.filter(col("cents") > 0)
      .agg(expr("sum(cents) div count(*)").as("thr"))
    val recent = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(DormantCutoff).cast("timestamp"))
      .select(col("o_custkey"))
    val dormant = cust
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(thr))
      .filter(col("cents") > col("thr"))
    dormant
      .join(broadcast(table(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_custs"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("n_name"))
  }

  val q132Oracle: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey,
       |         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
       |  FROM customer),
       |thr AS (
       |  SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr
       |  FROM c WHERE cents > 0)
       |SELECT n.n_name,
       |       count(*) AS n_custs,
       |       CAST(sum(c.cents) AS BIGINT) AS sum_cents
       |FROM c
       |JOIN nation n ON n.n_nationkey = c.c_nationkey
       |WHERE c.cents > (SELECT thr FROM thr)
       |  AND NOT EXISTS (SELECT 1 FROM orders o
       |                  WHERE o.o_custkey = c.c_custkey
       |                    AND o.o_orderdate >= TIMESTAMP '$DormantCutoff')
       |GROUP BY n.n_name
       |ORDER BY n.n_name""".stripMargin

  // ---------------------------------------------------------------- q133

  /** Suppliers holding more than their fair share of total revenue
    * (TPC-H Q11 archetype): per-supplier revenue vs the global total,
    * kept when `rev · n_suppliers > total` — i.e. above the mean — so
    * the predicate is scale-invariant (no tuned constant to re-fit per
    * SF) and decided by integer cross-multiplication, never a division.
    *
    * Revenue is the exact unscaled 4-decimal integer
    * `floor(price·(1−discount)·10⁴ + 0.5)` per row (price and discount
    * are 2-decimal fixed-point, so the product is exactly 4-decimal and
    * the quantization recovers it exactly — [[Exact]]'s argument).
    * Overflow budget: addend ≤ 1e9, per-supplier ~600 rows at every SF
    * (both sides scale together) ⇒ rev ≤ ~6e11; the global total holds
    * BIGINT to ~9e9 lineitem rows (~sf1500) and Spark's ANSI sum
    * raises loudly past it, matching the q84/q97 guard philosophy.
    *
    * Scale shape: one lineitem scan → map-side-partial sum on suppkey;
    * the 1-row (total, n_supp) frame broadcasts back; supplier
    * dimension broadcasts for the name. share_permille is integer
    * `div` — both engines truncate toward zero on positives.
    */
  def q133(spark: SparkSession, dir: String): DataFrame = {
    // The explicit isNotNull mirrors the null-filter the downstream
    // supplier join pushes into ITS copy of this subtree — without it
    // the two aggregate subtrees differ by that one Filter node and
    // ReuseExchange cannot dedupe them, re-scanning lineitem for the
    // 1-row totals pass (caught by ArchetypePackSpec's plan pin).
    // The oracle carries the same IS NOT NULL so a null-suppkey corpus
    // cannot split the engines: without it DuckDB would count a NULL
    // group into total_u4/n_supp that Spark excludes.
    val rev = table(spark, dir, "lineitem")
      .filter(col("l_suppkey").isNotNull)
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(10000.0) + lit(0.5)).cast("long").as("rev_u4"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("rev_u4")).as("rev_u4"))
    val tot = rev.agg(sum(col("rev_u4")).as("total_u4"),
      count(lit(1)).as("n_supp"))
    rev.crossJoin(broadcast(tot))
      .filter(col("rev_u4") * col("n_supp") > col("total_u4"))
      .join(broadcast(table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_u4"),
        expr("(1000 * rev_u4) div total_u4").as("share_permille"))
      .orderBy(col("rev_u4").desc, col("s_suppkey"))
  }

  val q133Oracle: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
      |                             * 10000.0 + 0.5) AS BIGINT))
      |              AS BIGINT) AS rev_u4
      |  FROM lineitem WHERE l_suppkey IS NOT NULL
      |  GROUP BY l_suppkey),
      |tot AS (
      |  SELECT CAST(sum(rev_u4) AS BIGINT) AS total_u4,
      |         count(*) AS n_supp
      |  FROM rev)
      |SELECT s.s_suppkey, s.s_name, r.rev_u4,
      |       CAST((1000 * r.rev_u4) // t.total_u4 AS BIGINT)
      |         AS share_permille
      |FROM rev r CROSS JOIN tot t
      |JOIN supplier s ON s.s_suppkey = r.l_suppkey
      |WHERE r.rev_u4 * t.n_supp > t.total_u4
      |ORDER BY r.rev_u4 DESC, s.s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q134

  /** Top-revenue suppliers for one quarter, ties kept (TPC-H Q15
    * archetype): revenue per supplier over shipments in
    * [1995-03-01, 1995-05-30), then every supplier whose revenue
    * EQUALS the global maximum — the view-against-its-own-max shape.
    * The max arrives as a 1-row broadcast (no window over the
    * aggregate needed, and no single-partition global sort); equality
    * on the exact BIGINT revenue makes "tie" well-defined on both
    * engines, which a double revenue cannot.
    *
    * Scale shape: the shipdate range predicate is a parquet
    * PushedFilter; the aggregate is map-side partial on suppkey; max
    * is a second tiny aggregate of the per-supplier frame.
    */
  def q134(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-05-30").cast("timestamp"))
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(10000.0) + lit(0.5)).cast("long").as("rev_u4"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("rev_u4")).as("rev_u4"))
    val mx = rev.agg(max(col("rev_u4")).as("max_u4"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_u4") === col("max_u4"))
      .join(broadcast(table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_u4"))
      .orderBy(col("s_suppkey"))
  }

  val q134Oracle: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
      |                             * 10000.0 + 0.5) AS BIGINT))
      |              AS BIGINT) AS rev_u4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1995-03-01'
      |    AND l_shipdate < TIMESTAMP '1995-05-30'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.rev_u4
      |FROM rev r
      |JOIN supplier s ON s.s_suppkey = r.l_suppkey
      |WHERE r.rev_u4 = (SELECT max(rev_u4) FROM rev)
      |ORDER BY s.s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q132_dormant_customers" -> (q132 _),
    "q133_revenue_share" -> (q133 _),
    "q134_top_supplier_ties" -> (q134 _))

  val oracles: Map[String, String] = Map(
    "q132_dormant_customers" -> q132Oracle,
    "q133_revenue_share" -> q133Oracle,
    "q134_top_supplier_ties" -> q134Oracle)
}
