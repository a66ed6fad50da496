package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q144-q146: operational-analytics archetypes — fulfillment-latency
  * distribution (the fact-to-fact co-partitioned join feeding a
  * compressed-domain median), RFM customer segmentation on
  * deterministic integer buckets, and the referential-integrity audit
  * every ingest pipeline runs before publishing a snapshot. Round-6
  * discipline: exact integer day/cent/bucket arithmetic throughout,
  * medians on frequency tables (never a corpus sort), single-scan
  * multi-edge validation, total ORDER BY on every output.
  */
object Relational12 {

  // ---------------------------------------------------------------- q144

  /** Fulfillment latency per order priority: days from order date to
    * the order's FIRST shipment, summarized per priority class as
    * count, lower median, and max. The shape 100 TB cares about: the
    * per-order min is a map-side-partial aggregate on the fact table,
    * the orders join is co-partitioned on the shared order key (both
    * sides shuffle once on it), and the median runs on the (priority,
    * delay-day) FREQUENCY table — ≤ |priorities|·|day domain| rows —
    * via the q137 cumulative-window device, never a corpus-wide sort.
    *
    * Both engines compute the delay on DATE-cast timestamps
    * (`datediff` / `date_diff('day')`), which agree exactly on this
    * corpus's midnight-aligned dates.
    */
  def q144(spark: SparkSession, dir: String): DataFrame = {
    val firstShip = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(col("l_shipdate").cast("date")).as("first_ship"))
    val delays = table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        col("o_orderdate").cast("date").as("od"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("priority"),
        datediff(col("first_ship"), col("od")).cast("long").as("delay_d"))
    val freq = delays.groupBy(col("priority"), col("delay_d"))
      .agg(count(lit(1)).as("cnt"))
    val wp = Window.partitionBy(col("priority"))
    val wcum = wp.orderBy(col("delay_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The max-delay bin always survives the median filter (its cum is
    // n, and n >= (n+1) div 2 for every n >= 1), so the per-priority
    // max needs no extra window — it is the max of the survivors.
    freq
      .withColumn("n", sum(col("cnt")).over(wp))
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy(col("priority"))
      .agg(max(col("n")).as("n_orders"),
        min(col("delay_d")).as("med_delay_d"),
        max(col("delay_d")).as("max_delay_d"))
      .orderBy(col("priority"))
  }

  val q144Oracle: String =
    """WITH fs AS (
      |  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY l_orderkey),
      |d AS (
      |  SELECT o.o_orderpriority AS priority,
      |         date_diff('day', CAST(o.o_orderdate AS DATE), fs.first_ship)
      |           AS delay_d
      |  FROM orders o JOIN fs ON fs.l_orderkey = o.o_orderkey),
      |freq AS (
      |  SELECT priority, delay_d, count(*) AS cnt
      |  FROM d GROUP BY priority, delay_d),
      |cums AS (
      |  SELECT priority, delay_d, cnt,
      |         sum(cnt) OVER (PARTITION BY priority) AS n,
      |         sum(cnt) OVER (PARTITION BY priority ORDER BY delay_d
      |                        ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM freq)
      |SELECT priority, CAST(max(n) AS BIGINT) AS n_orders,
      |       CAST(min(delay_d) AS BIGINT) AS med_delay_d,
      |       CAST(max(delay_d) AS BIGINT) AS max_delay_d
      |FROM cums WHERE cum >= (n + 1) // 2
      |GROUP BY priority ORDER BY priority""".stripMargin

  // ---------------------------------------------------------------- q145

  /** RFM customer segmentation on deterministic doubling buckets:
    * recency (days since the customer's last order, measured from the
    * corpus's max order date), frequency (order count), and monetary
    * (lifetime cents) each bucket by BIT LENGTH — bucket k covers
    * [2^(k-1), 2^k), the q143 device — so segmentation needs no
    * corpus-wide quantile pass (an ntile spelling would single-sort
    * the customer universe; doubling buckets are a narrow map), stays
    * stable as the corpus grows, and is integer-exact in both engines.
    * Zero maps to bucket 1 (`length(bin(0)) = 1`), so same-day-active
    * customers land with the 1-day ones.
    *
    * Scale shape: one orders scan → per-customer aggregate (map-side
    * partial on custkey); the reference date is a 1-row broadcast; the
    * segment rollup collapses to ≤ a few dozen rows.
    */
  def q145(spark: SparkSession, dir: String): DataFrame = {
    val perCust = table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("od")).as("last_od"), count(lit(1)).as("n_orders"),
        sum(col("cents")).as("cents"))
    val ref = perCust.agg(max(col("last_od")).as("ref_od"))
    perCust.crossJoin(broadcast(ref))
      .select(
        length(bin(datediff(col("ref_od"), col("last_od")).cast("long")))
          .cast("long").as("r_bucket"),
        length(bin(col("n_orders"))).cast("long").as("f_bucket"),
        length(bin(expr("cents div 10000"))).cast("long").as("m_bucket"))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
  }

  val q145Oracle: String =
    """WITH pc AS (
      |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_od,
      |         count(*) AS n_orders,
      |         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
      |              AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |ref AS (SELECT max(last_od) AS ref_od FROM pc),
      |b AS (
      |  SELECT
      |    CAST(length(bin(date_diff('day', last_od, r.ref_od))) AS BIGINT)
      |      AS r_bucket,
      |    CAST(length(bin(n_orders)) AS BIGINT) AS f_bucket,
      |    CAST(length(bin(cents // 10000)) AS BIGINT) AS m_bucket
      |  FROM pc CROSS JOIN ref r)
      |SELECT r_bucket, f_bucket, m_bucket, count(*) AS n_customers
      |FROM b GROUP BY r_bucket, f_bucket, m_bucket
      |ORDER BY r_bucket, f_bucket, m_bucket""".stripMargin

  // ---------------------------------------------------------------- q146

  /** Referential-integrity audit across the star schema's seven FK
    * edges: for each edge, the child row count, the number of orphan
    * rows (child keys with no parent), and the orphan rate in
    * per-mille — the pre-publication validation sweep every snapshot
    * pipeline runs, emitted as one row per edge whether or not
    * violations exist (a silent all-green is indistinguishable from a
    * check that never ran).
    *
    * Scale shape — the reason this is NOT seven anti-joins: each child
    * table is scanned ONCE per child role, left-joined against every
    * parent it references in the same pass (lineitem checks its three
    * parents in one scan), and orphans are counted as null-parent
    * flags in a single aggregate; the tiny per-child count frames then
    * unpivot to the edge rows. Null child keys count as orphans (a
    * null FK fails the audit's "resolvable" contract either way).
    */
  def q146(spark: SparkSession, dir: String): DataFrame = {
    def nullFlag(c: String): Column = when(col(c).isNull, 1L).otherwise(0L)
    val li = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .join(table(spark, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .join(table(spark, dir, "part").select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left")
      .join(table(spark, dir, "supplier").select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(nullFlag("o_orderkey")).as("o1"),
        sum(nullFlag("p_partkey")).as("o2"),
        sum(nullFlag("s_suppkey")).as("o3"))
      .select(explode(array(
        struct(lit("lineitem->orders").as("edge"), col("n"), col("o1").as("n_orphans")),
        struct(lit("lineitem->part").as("edge"), col("n"), col("o2").as("n_orphans")),
        struct(lit("lineitem->supplier").as("edge"), col("n"), col("o3").as("n_orphans"))))
        .as("r"))
      .select(col("r.edge"), col("r.n"), col("r.n_orphans"))
    val ord = table(spark, dir, "orders").select(col("o_custkey"))
      .join(table(spark, dir, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n"), sum(nullFlag("c_custkey")).as("n_orphans"))
      .select(lit("orders->customer").as("edge"), col("n"), col("n_orphans"))
    val cust = table(spark, dir, "customer").select(col("c_nationkey"))
      .join(broadcast(table(spark, dir, "nation").select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left")
      .agg(count(lit(1)).as("n"), sum(nullFlag("n_nationkey")).as("n_orphans"))
      .select(lit("customer->nation").as("edge"), col("n"), col("n_orphans"))
    val supp = table(spark, dir, "supplier").select(col("s_nationkey"))
      .join(broadcast(table(spark, dir, "nation")
        .select(col("n_nationkey").as("sn_nationkey"))),
        col("s_nationkey") === col("sn_nationkey"), "left")
      .agg(count(lit(1)).as("n"), sum(nullFlag("sn_nationkey")).as("n_orphans"))
      .select(lit("supplier->nation").as("edge"), col("n"), col("n_orphans"))
    val nat = table(spark, dir, "nation").select(col("n_regionkey"))
      .join(broadcast(table(spark, dir, "region").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"), "left")
      .agg(count(lit(1)).as("n"), sum(nullFlag("r_regionkey")).as("n_orphans"))
      .select(lit("nation->region").as("edge"), col("n"), col("n_orphans"))
    li.unionAll(ord).unionAll(cust).unionAll(supp).unionAll(nat)
      .select(col("edge"), col("n").as("n_rows"), col("n_orphans"),
        expr("(1000 * n_orphans) div n").as("orphan_permille"))
      .orderBy(col("edge"))
  }

  val q146Oracle: String =
    """WITH li AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS o1,
      |         sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS o2,
      |         sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS o3
      |  FROM lineitem l
      |  LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  LEFT JOIN part p ON p.p_partkey = l.l_partkey
      |  LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey),
      |ords AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS o1
      |  FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey),
      |cust AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN n2.n_nationkey IS NULL THEN 1 ELSE 0 END) AS o1
      |  FROM customer c
      |  LEFT JOIN nation n2 ON n2.n_nationkey = c.c_nationkey),
      |supp AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN n3.n_nationkey IS NULL THEN 1 ELSE 0 END) AS o1
      |  FROM supplier s
      |  LEFT JOIN nation n3 ON n3.n_nationkey = s.s_nationkey),
      |nat AS (
      |  SELECT count(*) AS n,
      |         sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS o1
      |  FROM nation n4
      |  LEFT JOIN region r ON r.r_regionkey = n4.n_regionkey),
      |edges AS (
      |  SELECT 'lineitem->orders' AS edge, n, o1 AS n_orphans FROM li
      |  UNION ALL SELECT 'lineitem->part', n, o2 FROM li
      |  UNION ALL SELECT 'lineitem->supplier', n, o3 FROM li
      |  UNION ALL SELECT 'orders->customer', n, o1 FROM ords
      |  UNION ALL SELECT 'customer->nation', n, o1 FROM cust
      |  UNION ALL SELECT 'supplier->nation', n, o1 FROM supp
      |  UNION ALL SELECT 'nation->region', n, o1 FROM nat)
      |SELECT edge, n AS n_rows, CAST(n_orphans AS BIGINT) AS n_orphans,
      |       CAST((1000 * n_orphans) // n AS BIGINT) AS orphan_permille
      |FROM edges ORDER BY edge""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_ship_delay" -> (q144 _),
    "q145_rfm_segments" -> (q145 _),
    "q146_fk_audit" -> (q146 _))

  val oracles: Map[String, String] = Map(
    "q144_ship_delay" -> q144Oracle,
    "q145_rfm_segments" -> q145Oracle,
    "q146_fk_audit" -> q146Oracle)
}
