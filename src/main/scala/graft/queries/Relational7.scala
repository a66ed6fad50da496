package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}
import graft.functions.CrossHash

/** q63-q68: third round-2 pack — UNPIVOT/melt, lateral top-k per group,
  * regexp_extract_all, error-tolerant casts, bitwise aggregates, and
  * two-variable statistical aggregates.
  */
object Relational7 {

  // ---------------------------------------------------------------- q63

  /** Wide→long melt (the inverse of q49's pivot) via the `unpivot`
    * operator: per-day event-type counts melted back to
    * (day, event_type, n). Unpivot is a zero-shuffle Expand — the only
    * shuffle is the upstream daily aggregate.
    */
  private val EventTypes = graft.Tables.EventTypes

  def q63(spark: SparkSession, dir: String): DataFrame = {
    val perType = EventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    val wide = table(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(perType.head, perType.tail: _*)
    wide.unpivot(
      ids = Array(col("day")),
      values = EventTypes.map(t => col(s"n_$t")).toArray,
      variableColumnName = "etype_col",
      valueColumnName = "n")
      .orderBy(col("day"), col("etype_col"))
  }

  val q63Oracle: String = {
    val cols = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n         ")
    val inList = EventTypes.map(t => s"n_$t").mkString(", ")
    s"""WITH wide AS (
       |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |         $cols
       |  FROM events GROUP BY 1)
       |SELECT day, etype_col, n
       |FROM wide UNPIVOT INCLUDE NULLS (n FOR etype_col IN ($inList))
       |ORDER BY day, etype_col""".stripMargin
  }

  // ---------------------------------------------------------------- q64

  /** Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 customers
    * by balance per nation, written the way an analyst writes it.
    * Catalyst decorrelates the limited lateral into a ranked window under
    * the hood — same physical plan as the manual row_number rewrite, so
    * the declarative form costs nothing at scale.
    */
  def q64(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir,
      "nation" -> "nation_v64", "customer" -> "customer_v64")(
      """SELECT n.n_name, l.c_custkey, l.c_acctbal
        |FROM nation_v64 n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal
        |  FROM customer_v64 c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 2) l
        |ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey""".stripMargin)

  val q64Oracle: String =
    """SELECT n.n_name, l.c_custkey, l.c_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_custkey, c_acctbal
      |  FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey
      |  LIMIT 2) l
      |ORDER BY n.n_name, l.c_acctbal DESC, l.c_custkey""".stripMargin

  // ---------------------------------------------------------------- q65

  /** regexp_extract_all: pull every long word (8+ letters) out of each
    * document — the canonical regex-harvest shape (URL/entity/email
    * extraction at scale). Narrow projection; the array is fingerprinted
    * by size + joined head so the compare stays string-typed.
    */
  def q65(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("words",
        regexp_extract_all(col("text"), lit("[A-Za-z]{8,}"), lit(0)))
      .select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_long_words"),
        array_join(slice(col("words"), 1, 3), ",").as("head3"))
      .orderBy(col("doc_id"))

  val q65Oracle: String =
    """SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z]{8,}')) AS BIGINT)
      |         AS n_long_words,
      |       coalesce(array_to_string(
      |           regexp_extract_all(text, '[A-Za-z]{8,}')[1:3], ','), '')
      |         AS head3
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q66

  /** Error-tolerant casting (dirty-input ingest): try_cast returns NULL
    * instead of failing the job — per-group parse success counts over a
    * deterministic mix of parseable and garbage strings. At 100 TB a
    * single malformed cell must never kill the pipeline; this is the
    * declarative guard. Input is strided 5x: each failing try_cast costs
    * a caught per-row exception in TRY eval mode, so the failure path is
    * ~50x a clean cast — bounding keeps the bench honest about it without
    * letting it dominate.
    */
  def q66(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v66")(
      """SELECT o_orderpriority,
        |       count(*) AS n,
        |       count(try_cast(substr(o_orderpriority, 1, 1) AS INT))
        |         AS n_prio_parsed,
        |       count(try_cast(o_orderstatus AS INT)) AS n_status_parsed,
        |       count(try_cast(CASE WHEN o_orderkey % 3 = 0
        |                           THEN CAST(o_orderkey AS STRING)
        |                           ELSE o_orderstatus END AS BIGINT))
        |         AS n_mixed_parsed
        |FROM orders_v66
        |WHERE o_orderkey % 5 = 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  val q66Oracle: String =
    """SELECT o_orderpriority,
      |       count(*) AS n,
      |       count(try_cast(substr(o_orderpriority, 1, 1) AS INT))
      |         AS n_prio_parsed,
      |       count(try_cast(o_orderstatus AS INT)) AS n_status_parsed,
      |       count(try_cast(CASE WHEN o_orderkey % 3 = 0
      |                           THEN CAST(o_orderkey AS VARCHAR)
      |                           ELSE o_orderstatus END AS BIGINT))
      |         AS n_mixed_parsed
      |FROM orders
      |WHERE o_orderkey % 5 = 0
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q67

  /** Bitwise aggregates over content hashes: bit_and/bit_or/bit_xor per
    * language — exact integer lattice ops (order-independent, so safe
    * cross-engine without rounding), the shape used for bloom-style
    * signature folding.
    */
  def q67(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("h", CrossHash.h60(col("text")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n"),
        bit_and(col("h")).as("h_and"),
        bit_or(col("h")).as("h_or"),
        bit_xor(col("h")).as("h_xor"))
      .orderBy(col("lang"))

  val q67Oracle: String = {
    val h = CrossHash.h60Sql("text")
    s"""SELECT lang, count(*) AS n,
       |       bit_and($h) AS h_and,
       |       bit_or($h) AS h_or,
       |       bit_xor($h) AS h_xor
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q68

  /** Two-variable statistical aggregates: stddev/variance (sample),
    * correlation and covariance of quantity vs extended price per return
    * flag. Both engines use numerically stable one-pass updates; results
    * are rounded at the group level (corr tighter — it is scale-free).
    */
  def q68(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("covar_qp"))
      .orderBy(col("l_returnflag"))

  val q68Oracle: String =
    """SELECT l_returnflag, count(*) AS n,
      |       round(stddev_samp(l_quantity), 4) AS sd_qty,
      |       round(var_samp(l_quantity), 4) AS var_qty,
      |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_unpivot" -> (q63 _),
    "q64_lateral_topk" -> (q64 _),
    "q65_regex_extract_all" -> (q65 _),
    "q66_try_cast" -> (q66 _),
    "q67_bitwise_agg" -> (q67 _),
    "q68_stats_agg" -> (q68 _))

  val oracles: Map[String, String] = Map(
    "q63_unpivot" -> q63Oracle,
    "q64_lateral_topk" -> q64Oracle,
    "q65_regex_extract_all" -> q65Oracle,
    "q66_try_cast" -> q66Oracle,
    "q67_bitwise_agg" -> q67Oracle,
    "q68_stats_agg" -> q68Oracle)
}
