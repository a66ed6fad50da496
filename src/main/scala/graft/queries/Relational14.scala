package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q152-q155: the remaining classic decision-support archetypes — TPC-H
  * Q13 (degree distribution: a histogram OF an aggregate), Q14
  * (conditional revenue share per period), Q18 (HAVING-threshold
  * semi-join back to the detail), and Q19 (disjunctive multi-table
  * bracket predicates). With these, every TPC-H query shape has a
  * Spark-first implementation on this corpus (Q1≈q02, Q3≈q39, Q5≈q148,
  * Q6≈q01, Q7≈q149, Q8≈q150, Q10≈q151, Q11≈q133, Q13≈q152, Q14≈q153,
  * Q15≈q134, Q16≈q11-family, Q17≈q138, Q18≈q154, Q19≈q155, Q21≈q131,
  * Q22≈q132).
  *
  * Same exactness discipline as [[Relational13]]: u4/cent quantization
  * before any sum, BIGINT-only decisions, total ORDER BY.
  */
object Relational14 {

  import Exact.{revU4, RevU4Sql}

  // ---------------------------------------------------------------- q152

  /** q152 counts only this priority class, so ~1/5 of orders qualify
    * and a measurable customer slice has ZERO of them (203 at sf0.01 —
    * probed); the zero bucket is what makes the left join observable.
    */
  val DistPriority = "1-URGENT"

  /** Customer order-count distribution (TPC-H Q13 archetype): how many
    * customers placed exactly k [[DistPriority]] orders, including
    * k = 0 — a histogram OF an aggregate, the double-rollup shape.
    *
    * Spark-first plan: orders pre-aggregates to (custkey, count) BEFORE
    * touching customer — the left join then carries one row per
    * customer against one row per ordering customer, never the raw
    * fact table (the literal Q13 left-join-then-count spelling shuffles
    * every order row into the join; the oracle keeps that spelling, so
    * the gate proves the rewrite). The second rollup's input is
    * |distinct counts| ≤ a few dozen rows; `coalesce(.., 0)` folds the
    * no-order customers into the k = 0 bucket.
    */
  def q152(spark: SparkSession, dir: String): DataFrame = {
    val perCust = table(spark, dir, "orders")
      .filter(col("o_orderpriority") === DistPriority)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
    table(spark, dir, "customer").select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("k"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q152Oracle: String =
    s"""WITH co AS (
       |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
       |  FROM customer c
       |  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       |    AND o.o_orderpriority = '$DistPriority'
       |  GROUP BY c.c_custkey)
       |SELECT c_count, count(*) AS custdist
       |FROM co GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q153

  /** q153 reporting year (12 monthly buckets, every month populated at
    * every SF) and the promoted part type. */
  val PromoYear = 1997
  val PromoType = "PROMO"

  /** Promotion revenue share per month (TPC-H Q14 archetype): for each
    * ship-month of [[PromoYear]], the permille of revenue earned on
    * [[PromoType]] parts — numerator and denominator from ONE
    * conditional aggregate pass, ratio decided by integer `div` on
    * exact u4 sums.
    *
    * Spark-first plan: the year filter is spelled as a HALF-OPEN
    * TIMESTAMP RANGE so it reaches the lineitem scan as a pushed
    * filter (pinned by ArchetypePack4Spec — a `year(ts) = N` spelling
    * is a function of the column and pushes nothing); part contributes
    * only a boolean
    * `is_promo` flag projected before the partkey join, so the join
    * carries one byte per part row instead of the type string. The
    * month key is the integer `year·100 + month` — no date formatting
    * in the aggregate path.
    */
  def q153(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(s"$PromoYear-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${PromoYear + 1}-01-01").cast("timestamp"))
      .select(col("l_partkey"),
        (year(col("l_shipdate")) * lit(100) + month(col("l_shipdate")))
          .cast("long").as("ship_ym"),
        revU4(col("l_extendedprice"), col("l_discount")).as("rev_u4"))
    val flags = table(spark, dir, "part")
      .select(col("p_partkey"),
        (col("p_type") === PromoType).as("is_promo"))
    li.join(flags, col("l_partkey") === col("p_partkey"))
      .groupBy(col("ship_ym"))
      .agg(
        sum(when(col("is_promo"), col("rev_u4")).otherwise(lit(0L)))
          .as("promo_u4"),
        sum(col("rev_u4")).as("total_u4"))
      .select(col("ship_ym"), col("promo_u4"), col("total_u4"),
        expr("(1000 * promo_u4) div total_u4").as("promo_permille"))
      .orderBy(col("ship_ym"))
  }

  val q153Oracle: String =
    s"""SELECT CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate)
       |            AS BIGINT) AS ship_ym,
       |       CAST(sum(CASE WHEN p.p_type = '$PromoType'
       |                     THEN $RevU4Sql ELSE 0 END) AS BIGINT)
       |         AS promo_u4,
       |       CAST(sum($RevU4Sql) AS BIGINT) AS total_u4,
       |       CAST((1000 * sum(CASE WHEN p.p_type = '$PromoType'
       |                             THEN $RevU4Sql ELSE 0 END))
       |            // sum($RevU4Sql) AS BIGINT) AS promo_permille
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE year(l.l_shipdate) = $PromoYear
       |GROUP BY year(l.l_shipdate) * 100 + month(l.l_shipdate)
       |ORDER BY ship_ym""".stripMargin

  // ---------------------------------------------------------------- q154

  /** q154 threshold on an order's total quantity. Line quantities are
    * integral 1..50 with ~4 lines/order, so the >250 tail exists at
    * every SF (25 orders at sf0.001, 204 at sf0.01, 2285 at sf0.1 —
    * probed) and stays a thin slice of the order population.
    */
  val BigSpenderQty = 250L

  /** Large-volume orders (TPC-H Q18 archetype): orders whose total line
    * quantity exceeds [[BigSpenderQty]], reported with customer name,
    * order price, and the offending quantity — the HAVING-threshold
    * aggregate whose survivors join BACK to detail tables.
    *
    * Spark-first plan: the per-order quantity rollup is a map-side
    * partial aggregate on the fact table's own layout; its thin
    * survivor set (HAVING > threshold) joins orders CO-PARTITIONED on
    * the shared orderkey, and the customer name join's left side is
    * |survivors| rows, which AQE turns into a broadcast at any scale
    * where it matters. Quantities are integral by corpus contract —
    * cast to BIGINT before summing, so the threshold compare is exact.
    */
  def q154(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_sum"))
      .filter(col("qty_sum") > BigSpenderQty)
    bigOrders
      .join(table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate").cast("date").as("o_date"),
            floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
              .as("price_cents")),
        col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_date"), col("price_cents"), col("qty_sum"))
      .orderBy(col("qty_sum").desc, col("o_orderkey"))
  }

  val q154Oracle: String =
    s"""WITH big AS (
       |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
       |           AS qty_sum
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING sum(CAST(l_quantity AS BIGINT)) > $BigSpenderQty)
       |SELECT c.c_custkey, c.c_name, o.o_orderkey,
       |       CAST(o.o_orderdate AS DATE) AS o_date,
       |       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
       |         AS price_cents,
       |       big.qty_sum
       |FROM big
       |JOIN orders o   ON big.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |ORDER BY qty_sum DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q155

  /** q155 brackets: (brand, size range, quantity range) triples. Each
    * bracket matches a real slice at every SF (153 rows at sf0.001 —
    * probed); the qty bounds' union is [1, 45], used as the lineitem
    * pre-filter.
    */
  val Brackets: Seq[(String, Int, Int, Long, Long)] = Seq(
    ("Brand#1", 1, 15, 1L, 20L),
    ("Brand#2", 10, 30, 10L, 30L),
    ("Brand#3", 20, 50, 20L, 45L))

  /** Bracketed-predicate revenue (TPC-H Q19 archetype): revenue per
    * brand over lines satisfying ANY of the [[Brackets]] — the
    * OR-of-ANDs predicate that spans BOTH join sides (brand+size live
    * on part, quantity on lineitem), the shape engines must decompose
    * to avoid a join-then-filter over the full fact table.
    *
    * Spark-first plan: the decomposition is explicit — part pre-filters
    * on the disjunction of its (brand AND size) conjuncts and lineitem
    * on the UNION of the quantity ranges (both reach the parquet scans
    * as pushed filters, pinned by ArchetypePack4Spec); the exact
    * OR-of-ANDs then re-applies after the join, so the pre-filters are
    * pure supersets and cannot change semantics. The oracle keeps the
    * naive join-then-WHERE spelling — the hash gate proves the
    * decomposition.
    */
  def q155(spark: SparkSession, dir: String): DataFrame = {
    val partSide = Brackets.map { case (b, sLo, sHi, _, _) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi)
    }.reduce(_ || _)
    val qtySide =
      col("l_quantity").between(Brackets.map(_._4).min, Brackets.map(_._5).max)
    val bracket = Brackets.map { case (b, sLo, sHi, qLo, qHi) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi) &&
        col("l_quantity").between(qLo, qHi)
    }.reduce(_ || _)
    table(spark, dir, "lineitem")
      .filter(qtySide)
      .select(col("l_partkey"), col("l_quantity"),
        revU4(col("l_extendedprice"), col("l_discount")).as("rev_u4"))
      .join(table(spark, dir, "part")
          .filter(partSide)
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .groupBy(col("p_brand"))
      .agg(sum(col("rev_u4")).as("rev_u4"), count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  val q155Oracle: String = {
    val cond = Brackets.map { case (b, sLo, sHi, qLo, qHi) =>
      s"(p.p_brand = '$b' AND p.p_size BETWEEN $sLo AND $sHi " +
        s"AND l.l_quantity BETWEEN $qLo AND $qHi)"
    }.mkString("(", "\n   OR ", ")")
    s"""SELECT p.p_brand,
       |       CAST(sum($RevU4Sql) AS BIGINT) AS rev_u4,
       |       count(*) AS n_lines
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE $cond
       |GROUP BY p.p_brand
       |ORDER BY p_brand""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_order_count_dist" -> (q152 _),
    "q153_promo_share" -> (q153 _),
    "q154_big_spenders" -> (q154 _),
    "q155_bracket_revenue" -> (q155 _))

  val oracles: Map[String, String] = Map(
    "q152_order_count_dist" -> q152Oracle,
    "q153_promo_share" -> q153Oracle,
    "q154_big_spenders" -> q154Oracle,
    "q155_bracket_revenue" -> q155Oracle)
}
