package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q148-q151: the star-join decision-support archetypes the surface did
  * not yet exercise as whole shapes — TPC-H Q5 (cyclic join constraint:
  * customer and supplier in the SAME nation), Q7 (directional
  * nation-pair trade volume), Q8 (market-share: conditional share of a
  * two-level aggregate), and Q10 (returned-item customer ranking).
  * Reference scope: the reference delegates its query surface to Athena
  * SQL (SURVEY.md §2.2); these are the canonical multi-join rollups that
  * surface supports.
  *
  * Round-6 discipline throughout: revenue is the exact unscaled
  * 4-decimal integer `floor(price·(1−discount)·10⁴ + 0.5)` per row
  * (the [[Exact]] argument — identical IEEE op sequence on both
  * engines), every sum/threshold/rank key is BIGINT, and every output
  * ends in a total ORDER BY.
  *
  * Scale shape shared by all four: lineitem scans ONCE per query and is
  * pruned by the most selective broadcast dimension BEFORE the
  * orderkey/custkey shuffles; nation/region (25/5 rows at every SF) and
  * supplier-keyed projections broadcast; the only wide exchanges are
  * the fact-fact orderkey join and the custkey rollup.
  */
object Relational13 {

  import Exact.{revU4, RevU4Sql}

  // ---------------------------------------------------------------- q148

  /** The q148 market region. Every region holds 5 nations and ~1/5 of
    * customers/suppliers at every SF, so the filter keeps rows from
    * sf0.001 up.
    */
  val LocalVolumeRegion = "ASIA"

  /** Local-supplier volume (TPC-H Q5 archetype): revenue per nation and
    * order-year where the customer and the line's supplier sit in the
    * SAME nation of [[LocalVolumeRegion]] — the one classic shape whose
    * join graph is a CYCLE (lineitem→orders→customer and
    * lineitem→supplier must agree on nationkey), not a star.
    *
    * Spark-first plan: supplier×nation×region collapses to a broadcast
    * (suppkey → n_name) map of the region's suppliers, applied to
    * lineitem BEFORE the orderkey shuffle — an inner broadcast join
    * that prunes ~4/5 of the fact table and closes the cycle with a
    * single `c_nationkey = s_nationkey` filter after the customer
    * join. (Restricting the SUPPLIER to the region is equivalent to
    * the oracle's customer-side region filter: equality forces both
    * into it.) The only wide shuffles are the co-partitioned
    * fact-fact orderkey join and the custkey join.
    */
  def q148(spark: SparkSession, dir: String): DataFrame = {
    val regionNations = table(spark, dir, "nation")
      .join(table(spark, dir, "region")
          .filter(col("r_name") === LocalVolumeRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val regionSupp = table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(regionNations, col("s_nationkey") === col("n_nationkey"))
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        revU4(col("l_extendedprice"), col("l_discount")).as("rev_u4"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
    val ord = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("rev_u4")).as("rev_u4"), count(lit(1)).as("n_lines"))
      .orderBy(col("o_year"), col("rev_u4").desc, col("n_name"))
  }

  /** Oracle keeps the literal Q5 spelling — region filter on the
    * CUSTOMER side, cycle closed in WHERE — so the hash gate proves the
    * supplier-side prune is equivalent.
    */
  val q148Oracle: String =
    s"""SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       |       CAST(sum($RevU4Sql) AS BIGINT) AS rev_u4,
       |       count(*) AS n_lines
       |FROM lineitem l
       |JOIN orders o    ON l.l_orderkey = o.o_orderkey
       |JOIN customer c  ON o.o_custkey = c.c_custkey
       |JOIN supplier s  ON l.l_suppkey = s.s_suppkey
       |JOIN nation n    ON c.c_nationkey = n.n_nationkey
       |JOIN region r    ON n.n_regionkey = r.r_regionkey
       |WHERE c.c_nationkey = s.s_nationkey
       |  AND r.r_name = '$LocalVolumeRegion'
       |GROUP BY n.n_name, year(o.o_orderdate)
       |ORDER BY o_year, rev_u4 DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q149

  /** The q149 trade pair. Both nations hold a supplier even in the
    * 10-supplier sf0.001 corpus (keys 3 and 8 — probed), so the pair
    * trades at every SF.
    */
  val TradeNationA = "NATION_3"
  val TradeNationB = "NATION_8"

  /** Directional trade volume between two nations (TPC-H Q7 archetype):
    * revenue per (supplier nation, customer nation, ship-year) for the
    * unordered pair {A, B}, both directions reported.
    *
    * Spark-first plan: the 2-row nation filter broadcasts into
    * supplier, and THAT ≤2/25 supplier slice broadcasts into lineitem
    * first — the most selective prune the query owns, applied before
    * any wide shuffle. Customers prune the same way on the other leg
    * (the custkey join's right side is pre-filtered to the pair's
    * nations, so the shuffle moves 2/25 of customer). The direction
    * predicate `supp_nation ≠ cust_nation` is evaluated on the two
    * broadcast-joined name columns — with both legs already restricted
    * to {A, B}, inequality IS the both-directions pair filter.
    */
  def q149(spark: SparkSession, dir: String): DataFrame = {
    val pairNations = table(spark, dir, "nation")
      .filter(col("n_name").isin(TradeNationA, TradeNationB))
      .select(col("n_nationkey"), col("n_name"))
    val supp = table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(pairNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(pairNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("ship_year"),
        revU4(col("l_extendedprice"), col("l_discount")).as("rev_u4"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      .agg(sum(col("rev_u4")).as("rev_u4"), count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  /** Oracle keeps the literal Q7 spelling: explicit two-direction OR
    * over both nation joins. */
  val q149Oracle: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       |       CAST(sum($RevU4Sql) AS BIGINT) AS rev_u4,
       |       count(*) AS n_lines
       |FROM lineitem l
       |JOIN orders o   ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
       |JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
       |WHERE (n1.n_name = '$TradeNationA' AND n2.n_name = '$TradeNationB')
       |   OR (n1.n_name = '$TradeNationB' AND n2.n_name = '$TradeNationA')
       |GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
       |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin

  // ---------------------------------------------------------------- q150

  /** q150 market definition: customers of this region buying parts of
    * this type; share measured for suppliers of this nation (has
    * suppliers at every SF — probed at sf0.001/0.01/0.1, non-zero
    * numerator every year).
    */
  val MarketRegion = "ASIA"
  val MarketPartType = "PROMO"
  val ShareNation = "NATION_3"

  /** Market share (TPC-H Q8 archetype): for each order-year, the
    * permille of [[MarketRegion]]-customer revenue on
    * [[MarketPartType]] parts that was supplied from [[ShareNation]] —
    * a conditional share of a two-level aggregate, decided by integer
    * `div` on exact u4 sums (no float ever forms the ratio).
    *
    * Spark-first plan: the type-filtered part keys prune lineitem on
    * the partkey shuffle first (the query's most selective edge,
    * ~1/6); supplier→nation-name broadcasts (the `when` flag rides the
    * row instead of a second pass); the market filter is a 5-row
    * broadcast semi-shape on the customer leg. One conditional
    * aggregate produces numerator and denominator in the same pass —
    * the two-level "all nations vs one nation" shape never scans
    * twice.
    */
  def q150(spark: SparkSession, dir: String): DataFrame = {
    val promoParts = table(spark, dir, "part")
      .filter(col("p_type") === MarketPartType).select(col("p_partkey"))
    val suppNat = table(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(table(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val marketNations = table(spark, dir, "nation")
      .join(table(spark, dir, "region")
          .filter(col("r_name") === MarketRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("mkt_nationkey"))
    table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revU4(col("l_extendedprice"), col("l_discount")).as("rev_u4"))
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .join(table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(marketNations),
        col("c_nationkey") === col("mkt_nationkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === ShareNation, col("rev_u4"))
          .otherwise(lit(0L))).as("share_u4"),
        sum(col("rev_u4")).as("mkt_u4"))
      .select(col("o_year"), col("share_u4"), col("mkt_u4"),
        expr("(1000 * share_u4) div mkt_u4").as("share_permille"))
      .orderBy(col("o_year"))
  }

  val q150Oracle: String =
    s"""WITH mkt AS (
       |  SELECT year(o.o_orderdate) AS o_year,
       |         n1.n_name AS supp_nation,
       |         $RevU4Sql AS rev_u4
       |  FROM lineitem l
       |  JOIN part p     ON l.l_partkey = p.p_partkey
       |  JOIN orders o   ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
       |  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
       |  JOIN region r   ON n2.n_regionkey = r.r_regionkey
       |  WHERE r.r_name = '$MarketRegion' AND p.p_type = '$MarketPartType')
       |SELECT CAST(o_year AS BIGINT) AS o_year,
       |       CAST(sum(CASE WHEN supp_nation = '$ShareNation'
       |                     THEN rev_u4 ELSE 0 END) AS BIGINT) AS share_u4,
       |       CAST(sum(rev_u4) AS BIGINT) AS mkt_u4,
       |       CAST((1000 * sum(CASE WHEN supp_nation = '$ShareNation'
       |                             THEN rev_u4 ELSE 0 END))
       |            // sum(rev_u4) AS BIGINT) AS share_permille
       |FROM mkt GROUP BY o_year ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- q151

  /** q151 reporting window: first half of 1997 (640 returning customers
    * at sf0.01 — probed; the window is date-range pruning under test).
    */
  val ReturnsFrom = "1997-01-01"
  val ReturnsUntil = "1997-07-01"
  val ReturnsTopK = 20

  /** Returned-item customer ranking (TPC-H Q10 archetype): the top
    * [[ReturnsTopK]] customers by revenue of lines returned
    * (`l_returnflag = 'R'`) against orders placed in the reporting
    * window, with nation name attached.
    *
    * Spark-first plan: both fact scans carry their pushed filters
    * (returnflag on lineitem, the date range on orders — pinned by
    * ArchetypePack4Spec); the custkey rollup happens BEFORE the
    * customer dimension join, so the join input is |returning
    * customers|, not |returned lines|; nation broadcasts; the final
    * rank is TakeOrderedAndProject (never a global sort). Ties break
    * on custkey, so the top-k cut is deterministic cross-engine.
    */
  def q151(spark: SparkSession, dir: String): DataFrame = {
    val returned = table(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        revU4(col("l_extendedprice"), col("l_discount")).as("rev_u4"))
    val ord = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(ReturnsFrom).cast("timestamp") &&
        col("o_orderdate") < lit(ReturnsUntil).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    returned
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev_u4")).as("rev_u4"), count(lit(1)).as("n_lines"))
      .join(table(spark, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("rev_u4"), col("n_lines"))
      .orderBy(col("rev_u4").desc, col("c_custkey"))
      .limit(ReturnsTopK)
  }

  val q151Oracle: String =
    s"""SELECT c.c_custkey, c.c_name, n.n_name,
       |       CAST(sum($RevU4Sql) AS BIGINT) AS rev_u4,
       |       count(*) AS n_lines
       |FROM lineitem l
       |JOIN orders o   ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation n   ON c.c_nationkey = n.n_nationkey
       |WHERE l.l_returnflag = 'R'
       |  AND o.o_orderdate >= TIMESTAMP '$ReturnsFrom'
       |  AND o.o_orderdate <  TIMESTAMP '$ReturnsUntil'
       |GROUP BY c.c_custkey, c.c_name, n.n_name
       |ORDER BY rev_u4 DESC, c_custkey
       |LIMIT $ReturnsTopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_local_supplier_volume" -> (q148 _),
    "q149_nation_trade_pairs" -> (q149 _),
    "q150_market_share" -> (q150 _),
    "q151_returned_items" -> (q151 _))

  val oracles: Map[String, String] = Map(
    "q148_local_supplier_volume" -> q148Oracle,
    "q149_nation_trade_pairs" -> q149Oracle,
    "q150_market_share" -> q150Oracle,
    "q151_returned_items" -> q151Oracle)
}
