package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q33-q35: second relational pack — exact percentiles, conditional
  * pivot, and deterministic array aggregation.
  */
object Relational2 {

  // ---------------------------------------------------------------- q33

  /** Exact interpolated percentiles per return flag, spelled as a
    * window-rank pick instead of the `percentile()` aggregate: the
    * built-in is a TypedImperativeAggregate whose partial state is a
    * value→count map — with ~unique doubles (583k distinct / 600k rows
    * at sf0.1) every partial buffer serializes a near-full copy of its
    * input and the 3 final groups single-threadedly merge and sort all
    * of it (2.2-2.8 s at sf0.1). Here one hash exchange on the flag
    * feeds a per-group sort (row_number), the quantile rows are picked
    * by position, and the follow-up groupBy reuses the window's
    * partitioning (no second exchange). ~4× faster, same answer.
    *
    * The interpolation `(1-frac)*lo + frac*hi` is bit-identical to the
    * built-in's (verified exhaustively at sf0.01+sf0.1 — the algebraic
    * twin `lo + frac*(hi-lo)` is NOT, off by 1 ULP on ~10% of picks).
    * `0.25D` suffixes keep the SQL literals DOUBLE (bare `0.25` parses
    * as DECIMAL and changes the arithmetic). Rounding stays at the
    * group level only.
    *
    * Scale note: like the aggregate form, parallelism is bounded by the
    * group count (3 reducers carry the sorts). The 100 TB path for
    * exact quantiles is a distributed k-th-selection; the sketch path
    * (`percentile_approx`) is q38's territory.
    */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v33")
    def pick(q: String, tag: String): String =
      s"""max(CASE WHEN pos = CAST(floor((n-1) * ${q}D) AS BIGINT) THEN p END) AS lo$tag,
         |  max(CASE WHEN pos = CAST(ceil((n-1) * ${q}D) AS BIGINT) THEN p END) AS hi$tag""".stripMargin
    def interp(q: String, tag: String): String =
      s"round((1.0D - ((n-1) * ${q}D - floor((n-1) * ${q}D))) * lo$tag + " +
        s"((n-1) * ${q}D - floor((n-1) * ${q}D)) * hi$tag, 4) AS p$tag"
    spark.sql(
      s"""WITH ranked AS (
         |  SELECT l_returnflag, l_extendedprice AS p,
         |         row_number() OVER (PARTITION BY l_returnflag
         |                            ORDER BY l_extendedprice) - 1 AS pos,
         |         count(*) OVER (PARTITION BY l_returnflag) AS n
         |  FROM lineitem_v33),
         |picks AS (
         |  SELECT l_returnflag,
         |  ${pick("0.25", "25")},
         |  ${pick("0.5", "50")},
         |  ${pick("0.75", "75")},
         |  max(n) AS n
         |  FROM ranked GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |       ${interp("0.25", "25")},
         |       ${interp("0.5", "50")},
         |       ${interp("0.75", "75")},
         |       n
         |FROM picks ORDER BY l_returnflag""".stripMargin)
  }

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
