package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}

/** q49/q51/q53-q55: round-2 relational coverage — the `pivot()`
  * relational operator, CUBE, distribution window functions
  * (ntile/percent_rank/cume_dist), histogram binning, and time-series
  * gap fill over a generated spine.
  */
object Relational6 {

  // ---------------------------------------------------------------- q49

  /** The `RelationalGroupedDataset.pivot` operator proper (q34 covers the
    * manual sum(CASE) spelling). The value list is EXPLICIT — without it
    * Spark runs a separate distinct-scan job over the pivot column to
    * discover values, which at 100 TB is a full extra pass. With it the
    * plan is Spark's two-phase pivot: pre-aggregate on (bucket, type),
    * then PivotFirst over the (tiny) aggregated rows — one more exchange
    * than q34's single-shuffle sum(CASE), but both exchanges move
    * already-aggregated data, so the scan-side cost is identical. Empty
    * cells surface as NULL counts, pinned to 0 to match the oracle.
    */
  private val EventTypes = graft.Tables.EventTypes

  def q49(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = table(spark, dir, "events")
      .withColumn("bucket", col("user_id") % 50)
      .groupBy(col("bucket"))
      .pivot("event_type", EventTypes)
      .count()
    pivoted.select(
      col("bucket") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("bucket"))
  }

  val q49Oracle: String = {
    val cols = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n       ")
    s"""SELECT user_id % 50 AS bucket,
       |       $cols
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q51

  /** Full CUBE over two dimensions (q12 covers ROLLUP, q45 covers
    * explicit GROUPING SETS): all four grouping combinations in one
    * shuffle via Catalyst's Expand. The band expression is computed in a
    * subquery so both engines cube over plain columns.
    */
  def q51(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "customer" -> "customer_v51")(
      """WITH c AS (
        |  SELECT c_mktsegment, CAST(c_nationkey % 5 AS BIGINT) AS nation_band,
        |         c_acctbal
        |  FROM customer_v51)
        |SELECT c_mktsegment, nation_band,
        |       CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
        |       CAST(grouping(nation_band) AS BIGINT) AS g_band,
        |       count(*) AS n_cust,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM c
        |GROUP BY CUBE (c_mktsegment, nation_band)
        |ORDER BY g_seg, g_band,
        |         c_mktsegment ASC NULLS FIRST,
        |         nation_band ASC NULLS FIRST""".stripMargin)

  val q51Oracle: String =
    """WITH c AS (
      |  SELECT c_mktsegment, CAST(c_nationkey % 5 AS BIGINT) AS nation_band,
      |         c_acctbal
      |  FROM customer)
      |SELECT c_mktsegment, nation_band,
      |       CAST(grouping(c_mktsegment) AS BIGINT) AS g_seg,
      |       CAST(grouping(nation_band) AS BIGINT) AS g_band,
      |       count(*) AS n_cust,
      |       round(sum(c_acctbal), 2) AS total_bal
      |FROM c
      |GROUP BY CUBE (c_mktsegment, nation_band)
      |ORDER BY g_seg, g_band,
      |         c_mktsegment ASC NULLS FIRST,
      |         nation_band ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q53

  /** Distribution window functions q07 doesn't cover: ntile quartiles,
    * percent_rank, cume_dist. The window ORDER BY carries c_custkey as a
    * tiebreaker — ntile splits ties by position, so without a total order
    * inside the window the quartile assignment is engine-dependent.
    * percent_rank/cume_dist are exact rational arithmetic over identical
    * ints, so the raw doubles are bit-equal cross-engine (no rounding).
    */
  def q53(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "customer" -> "customer_v53")(
      """SELECT c_mktsegment, c_custkey,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM customer_v53
        |WHERE c_custkey % 20 = 0
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin)

  val q53Oracle: String =
    """SELECT c_mktsegment, c_custkey,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd
      |FROM customer
      |WHERE c_custkey % 20 = 0
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q54

  /** Fixed-width histogram binning by integer arithmetic (floor(x/w)) —
    * portable to any engine, single shuffle on the bin key. min/max stay
    * UNrounded: they select raw parquet values, identical by construction,
    * whereas re-rounding them per-engine is the classic HALF_UP-vs-FP trap.
    */
  def q54(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .withColumn("bin", floor(col("o_totalprice") / 30000).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total"),
        min(col("o_totalprice")).as("bin_min"),
        max(col("o_totalprice")).as("bin_max"))
      .orderBy(col("bin"))

  val q54Oracle: String =
    """SELECT CAST(floor(o_totalprice / 30000) AS BIGINT) AS bin,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS total,
      |       min(o_totalprice) AS bin_min,
      |       max(o_totalprice) AS bin_max
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q55

  /** Time-series gap fill: generate the full hourly spine between the
    * observed bounds, cross the (tiny) dimension of event types, left-join
    * real counts and zero-fill the holes. The spine and type dims are
    * driver-side tiny → both joins broadcast; the only shuffle is the
    * hourly pre-aggregate of the fact side. Bounded to the first 3 days
    * to keep the oracle row count stable.
    */
  def q55(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .filter(col("ts") < to_timestamp(lit("2024-01-04 00:00:00")))
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val spine = bounds.select(
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
    spine.crossJoin(broadcast(types))
      .join(counts, Seq("hour", "event_type"), "left")
      .select(
        col("hour"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("sv"), lit(0.0)).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  val q55Oracle: String =
    """WITH ev AS (
      |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04 00:00:00'),
      |b AS (
      |  SELECT date_trunc('hour', min(ts)) AS h0,
      |         date_trunc('hour', max(ts)) AS h1 FROM ev),
      |spine AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |c AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type,
      |         count(*) AS n, round(sum(value), 2) AS sv
      |  FROM ev GROUP BY 1, 2)
      |SELECT s.hour, t.event_type,
      |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_events,
      |       coalesce(c.sv, 0.0) AS sum_value
      |FROM spine s CROSS JOIN types t
      |LEFT JOIN c ON c.hour = s.hour AND c.event_type = t.event_type
      |ORDER BY s.hour, t.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_pivot_relational" -> (q49 _),
    "q51_cube" -> (q51 _),
    "q53_ntile_distribution" -> (q53 _),
    "q54_histogram_bins" -> (q54 _),
    "q55_gap_fill_spine" -> (q55 _))

  val oracles: Map[String, String] = Map(
    "q49_pivot_relational" -> q49Oracle,
    "q51_cube" -> q51Oracle,
    "q53_ntile_distribution" -> q53Oracle,
    "q54_histogram_bins" -> q54Oracle,
    "q55_gap_fill_spine" -> q55Oracle)
}
