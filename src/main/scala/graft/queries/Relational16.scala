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
  *    support×lift, permille-exact integers). Pairs are generated
  *    MAP-SIDE from per-order basket arrays (see q183's scaladoc — the
  *    round-14 rewrite of the former orderkey self-join); TPC-H baskets
  *    are ≤7 lines, so each basket row expands to ≤21 pairs and the
  *    basket shuffle key (orderkey) has no skew by schema. Per-part
  *    counts join back BROADCAST (part domain ≪ fact table); the global
  *    order count is a broadcast scalar. Top-50 under a total
  *    (pair_n DESC, keys) order → TakeOrderedAndProject, never a full
  *    sort.
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

  /** q183: top-50 co-ordered part pairs with support and lift.
    *
    * Round-14 rewrite (the production lever the r13 partition
    * experiment demanded): the previous orderkey SELF-JOIN materialized
    * the C(basket,2) pair frame through a sort-merge join — two 6M-row
    * join sorts plus ~90M wide join rows at sf10, a MAP-side cost that
    * reducer scaling provably made worse (32→128 partitions = 1.5×
    * slower, BASELINE.md round-13 table). Now each order pre-aggregates
    * to ONE sorted distinct basket row (`collect_set` fuses the
    * (okey, pkey) dedup into the same shuffle), and pairs are generated
    * map-side by a nested `transform` over the sorted array (x before y
    * in the sort order ⇒ pk_a < pk_b, strict since collect_set deduped)
    * feeding straight into the partial pair aggregation.
    *
    * Round-15 fix (VERDICT r14 item 1): the r14 plan relied on
    * ReuseExchange to share the basket aggregate, but the
    * `.toDF("pk_a","n_a")`/`.toDF("pk_b","n_b")` renames made the
    * three consumer subtrees non-identical, so the shipped plan scanned
    * lineitem 4× and rebuilt the collect_set basket aggregation 3×
    * (PLANS_r14.txt q183) — paying the ~15 s/sf10 basket build three
    * times. Now `baskets` is materialized ONCE via an eager
    * `localCheckpoint` and every consumer (pair generator, per-part
    * supports, order count) reads the checkpointed blocks; `perPart` is
    * likewise checkpointed (part-domain-sized) and joined under two
    * renamed heads. localCheckpoint, not `persist()`: the CacheManager
    * keys cached plans by logical plan, so a persisted frame would be
    * silently shared ACROSS bench iterations (warm-repeat medians would
    * measure the cache, not the query), while a checkpointed RDD is
    * fresh per call and its blocks are dropped when the RDD is GC'd.
    * Eager, not lazy: the two broadcast-exchange jobs run as concurrent
    * futures and a lazily-persisted frame could be computed twice
    * before its blocks register. Lineitem is thus scanned exactly once
    * per invocation (inside the checkpoint job), and the final plan
    * reads three `Scan ExistingRDD`s — no parquet rescan anywhere.
    *
    * 100 TB note: localCheckpoint trades fault-tolerance for speed —
    * the truncated lineage means a lost executor kills the job rather
    * than recomputing its blocks. For a one-query analytic that retries
    * cheaply this is the right trade (and on a real cluster the win
    * GROWS: the local rung hides most of the 3x rescan in the page
    * cache, while a cluster re-reading 100 TB of lineitem pays it in
    * full); a long multi-stage pipeline embedding this shape should
    * use `persist(MEMORY_AND_DISK)` + explicit unpersist, or a
    * reliable `checkpoint()`, at the same point in the plan. That
    * guidance is a SEAM (VERDICT r15 item 5): `q183Basket(strategy =
    * Persist)` selects fault-tolerant `persist(MEMORY_AND_DISK)` at
    * exactly the same two plan points — identical results, recompute-
    * on-executor-loss semantics — for pipelines embedding this shape.
    * The gate query keeps the checkpoint default (fresh blocks per
    * call; a persisted frame would be silently shared across bench
    * iterations by the plan-keyed CacheManager).
    */
  def q183(spark: SparkSession, dir: String): DataFrame =
    q183Basket(spark, dir, LocalCheckpoint)

  /** Shared-frame materialization strategy for [[q183Basket]]. */
  sealed trait BasketMaterialize
  /** Eager lineage cut; fastest, blocks lost with an executor. */
  case object LocalCheckpoint extends BasketMaterialize
  /** Fault-tolerant MEMORY_AND_DISK persist for pipeline embedding;
    * eagerly materialized here (a count action) so concurrent broadcast
    * futures can't race to compute the frame twice — the same hazard
    * the eager checkpoint avoids. */
  case object Persist extends BasketMaterialize

  def q183Basket(spark: SparkSession, dir: String,
      strategy: BasketMaterialize): DataFrame = {
    def materialize(df: DataFrame): DataFrame = strategy match {
      case LocalCheckpoint => df.localCheckpoint()
      case Persist =>
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count() // eager: register blocks before the concurrent consumers
        p
    }
    // NOT repartitioned before the checkpoint (r17 negative result,
    // guide §1.1 empirical loop): AQE coalesces the basket exchange to
    // ~4 byte-sized partitions while the pair explode is CPU-dense, so
    // spreading to defaultParallelism looked like the §2.6 fix — but
    // measured WORSE end to end (QProfile r17: wall 2.49 s -> 3.68 s;
    // the pair stage's taskSum inflated 2.9 s -> 21.7 s with 1.2 s GC
    // across 32 concurrent explode tasks, and the perPart explode
    // slowed 0.10 s -> 0.45 s wall). Same conclusion as the r16
    // repartition-after-read revert: on this host extra concurrent
    // allocation-heavy tasks burn far more CPU than the wall they
    // recover. Kept as a documented no-go; a cluster where the basket
    // frame has real width gets its parallelism from the exchange
    // itself.
    val baskets = materialize(table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps")))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val perPart = materialize(baskets.select(explode(col("ps")).as("pkey"))
      .groupBy(col("pkey")).agg(count(lit(1)).as("n_p")))
    // OPTIMIZATION r17 (guide §1.2 "don't compute things you throw
    // away", §3.1): the final ordering (pair_n DESC, pk_a, pk_b) is
    // fully determined BEFORE the support joins — the joins only attach
    // n_a/n_b/lift and can never drop a pair (every pair pkey exists in
    // perPart by construction). So the top-50 cut moves onto the pair
    // aggregate itself (TakeOrderedAndProject over the pair counts) and
    // the joins run on 50 rows with the 50-row side broadcast. The old
    // shape force-broadcast perPart TWICE — a frame that grows with the
    // part domain (QProfile sf1: two ~2 s near-zero-CPU broadcast-build
    // jobs, 3.7 s of the query's 6.7 s; at 100 TB it courts the 8 GB
    // broadcast cap) — and computed lift for every pair only to keep 50.
    val top = baskets
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    y -> struct(x AS pk_a, y AS pk_b))))""".stripMargin)).as("pr"))
      .select(col("pr.pk_a"), col("pr.pk_b"))
      .groupBy(col("pk_a"), col("pk_b"))
      .agg(count(lit(1)).as("pair_n"))
      .orderBy(col("pair_n").desc, col("pk_a"), col("pk_b"))
      .limit(50)
    // both joins keep the ≤50-row side as the broadcast build and
    // stream perPart straight off its checkpoint: no perPart shuffle,
    // no perPart broadcast, at any scale
    broadcast(broadcast(top).join(perPart.toDF("pk_a", "n_a"), "pk_a"))
      .join(perPart.toDF("pk_b", "n_b"), "pk_b")
      .crossJoin(broadcast(nOrders))
      .select(col("pk_a"), col("pk_b"), col("pair_n"), col("n_a"),
        col("n_b"),
        expr("1000 * pair_n * n_orders DIV (n_a * n_b)")
          .as("lift_permille"))
      .orderBy(col("pair_n").desc, col("pk_a"), col("pk_b"))
  }

  val q183Oracle: String =
    // items is referenced four times (n_o, pp, both self-join sides) —
    // MATERIALIZED stops DuckDB re-inlining the 6M-row DISTINCT per use
    """WITH items AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS pkey
      |  FROM lineitem),
      |n_o AS (SELECT count(DISTINCT okey) AS n_orders FROM items),
      |pp AS MATERIALIZED (SELECT pkey, count(*) AS n_p FROM items GROUP BY pkey),
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

  // ---------------------------------------------------------------- q199

  /** q199: column-profile report over `orders` — the ETL data-quality
    * summary (row count, null count, exact distinct count per column)
    * every ingest run logs before promoting a partition. Computed in
    * ONE aggregate pass (count + 6 conditional counts + 6 exact
    * count-distincts — Spark expands multi-distinct into a single
    * expand+aggregate, not 6 scans) and unpivoted to the (column,
    * stats) report shape with stack().
    */
  def q199(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
          countDistinct(col(c)).as(s"nd_$c"))
      }
    val stackArgs = cols
      .map(c => s"'$c', null_$c, nd_$c").mkString(", ")
    table(spark, dir, "orders")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
      .orderBy(col("col_name"))
  }

  val q199Oracle: String = {
    val branches = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct FROM orders""".stripMargin
    }
    branches.mkString("WITH u AS (\n", "\nUNION ALL\n", """)
      |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST(n_nulls AS BIGINT) AS n_nulls,
      |       CAST(n_distinct AS BIGINT) AS n_distinct
      |FROM u ORDER BY col_name""".stripMargin)
  }

  // ---------------------------------------------------------------- q200

  /** q200: join-key skew profile of `lineitem.l_orderkey` — the
    * diagnostic run before choosing a salting factor (q47) or trusting
    * AQE's skew split. Per-key multiplicities collapse to a
    * COUNT-OF-COUNTS histogram first (distinct multiplicities are
    * bounded by the max basket size — single digits for TPC-H, never
    * corpus-sized), so the p50/p99 selection by cumulative rank and the
    * max/mean run on a frame of a few rows; no global sort of the key
    * domain ever happens. Nearest-rank percentiles as exact integers:
    * p = min multiplicity whose cumulative key count reaches
    * ceil(q·n_keys).
    */
  def q200(spark: SparkSession, dir: String): DataFrame = {
    val cc = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n_k"))
    val w = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // int64 budget (engine + oracle tot CTE): sum(c·n_k) telescopes to
    // exactly count(*) of lineitem — a row count, < 2⁶³ by definition
    cc.withColumn("cum", sum(col("n_k")).over(w))
      .crossJoin(broadcast(cc.agg(sum(col("n_k")).as("n_keys"),
        sum(col("c") * col("n_k")).as("n_rows"), max(col("c")).as("max_c"))))
      .select(col("c"), col("cum"), col("n_keys"), col("n_rows"),
        col("max_c"))
      .agg(max(col("n_keys")).as("n_keys"), max(col("n_rows")).as("n_rows"),
        max(col("max_c")).as("max_c"),
        min(when(col("cum") * 2 >= col("n_keys"), col("c")))
          .as("p50_c"),
        min(when(col("cum") * 100 >= col("n_keys") * 99, col("c")))
          .as("p99_c"))
      .select(col("n_keys"), col("n_rows"), col("max_c"), col("p50_c"),
        col("p99_c"),
        expr("1000 * n_rows DIV n_keys").as("mean_c_permille"),
        expr("1000 * max_c DIV p50_c").as("skew_permille"))
  }

  val q200Oracle: String =
    """WITH kc AS (
      |  SELECT l_orderkey, count(*) AS c FROM lineitem
      |  GROUP BY l_orderkey),
      |cc AS (SELECT c, count(*) AS n_k FROM kc GROUP BY c),
      |tot AS (
      |  SELECT sum(n_k) AS n_keys, sum(c * n_k) AS n_rows,
      |         max(c) AS max_c
      |  FROM cc),
      |cum AS (
      |  SELECT c, sum(n_k) OVER (ORDER BY c
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM cc)
      |SELECT CAST(t.n_keys AS BIGINT) AS n_keys,
      |       CAST(t.n_rows AS BIGINT) AS n_rows,
      |       CAST(t.max_c AS BIGINT) AS max_c,
      |       CAST(min(CASE WHEN cum * 2 >= t.n_keys THEN c END)
      |         AS BIGINT) AS p50_c,
      |       CAST(min(CASE WHEN cum * 100 >= t.n_keys * 99 THEN c END)
      |         AS BIGINT) AS p99_c,
      |       CAST(1000 * t.n_rows // t.n_keys AS BIGINT)
      |         AS mean_c_permille,
      |       CAST(1000 * t.max_c
      |            // min(CASE WHEN cum * 2 >= t.n_keys THEN c END)
      |         AS BIGINT) AS skew_permille
      |FROM cum CROSS JOIN tot t
      |GROUP BY t.n_keys, t.n_rows, t.max_c""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_basket_lift" -> (q183 _),
    "q184_trimmed_stats" -> (q184 _),
    "q187_rolling_median" -> (q187 _),
    "q199_data_profile" -> (q199 _),
    "q200_skew_profile" -> (q200 _))

  val oracles: Map[String, String] = Map(
    "q183_basket_lift" -> q183Oracle,
    "q184_trimmed_stats" -> q184Oracle,
    "q187_rolling_median" -> q187Oracle,
    "q199_data_profile" -> q199Oracle,
    "q200_skew_profile" -> q200Oracle)
}
