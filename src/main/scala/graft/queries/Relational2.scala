package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q33-q35: second relational pack — exact percentiles, conditional
  * pivot, and deterministic array aggregation.
  */
object Relational2 {

  // ---------------------------------------------------------------- q33

  /** Exact interpolated percentiles per return flag. `percentile` (not
    * `percentile_approx`) so the DuckDB `quantile_cont` twin computes the
    * same interpolation; rounded because the engines factor the
    * interpolation arithmetic differently in the last bits.
    */
  def q33(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("ps"),
        count(lit(1)).as("n"))
      .select(
        col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        col("n"))
      .orderBy(col("l_returnflag"))

  val q33Oracle: String =
    """WITH q AS (
      |  SELECT l_returnflag,
      |         quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS ps,
      |         count(*) AS n
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |       round(ps[1], 4) AS p25, round(ps[2], 4) AS p50,
      |       round(ps[3], 4) AS p75, n
      |FROM q ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q34

  /** Conditional-aggregate pivot: daily event counts spread across one
    * column per event type (`sum(CASE WHEN ...)`) — the shuffle-free way
    * to pivot a low-cardinality dimension at scale (vs `pivot()`, which
    * needs a value scan or an explicit list anyway).
    */
  private val EventTypes = graft.Tables.EventTypes

  def q34(spark: SparkSession, dir: String): DataFrame = {
    val perType = EventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    table(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(perType.head, perType.tail: _*)
      .orderBy(col("day"))
  }

  /** Oracle casts: DuckDB `date_trunc('day', ts)` yields DATE (Spark
    * yields TIMESTAMP — 'hour' stays TIMESTAMP in both, which is why q20
    * never tripped), and `sum(INTEGER)` yields HUGEINT → float64 through
    * pandas. Both must be pinned to the Spark-side types for the driver's
    * value hash to line up.
    */
  val q34Oracle: String = {
    val cols = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n       ")
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       $cols
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q35

  /** Deterministic array aggregation: collect_list is order-nondeterministic
    * by itself, so the engine contract is sort-then-join — the pattern any
    * scale-safe array agg must follow.
    */
  def q35(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .filter(col("c_custkey") % 199 === 0)
      .groupBy(col("c_mktsegment"))
      .agg(
        expr("""array_join(transform(sort_array(collect_list(c_custkey)),
                e -> cast(e as string)), ',')""").as("sample_keys"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))

  val q35Oracle: String =
    """SELECT c_mktsegment,
      |       array_to_string(list_sort(list(c_custkey)), ',') AS sample_keys,
      |       count(*) AS n
      |FROM customer WHERE c_custkey % 199 = 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_percentiles" -> (q33 _),
    "q34_conditional_pivot" -> (q34 _),
    "q35_array_agg" -> (q35 _))

  val oracles: Map[String, String] = Map(
    "q33_percentiles" -> q33Oracle,
    "q34_conditional_pivot" -> q34Oracle,
    "q35_array_agg" -> q35Oracle)
}
