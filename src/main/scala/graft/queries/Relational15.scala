package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q174: skyline (Pareto-frontier) query — Börzsönyi, Kossmann &
  * Stocker, ICDE 2001 "The Skyline Operator". The classic operator the
  * TPC-H archetype matrix has no shape for: keep every part no other
  * part dominates, minimizing `p_retailprice` while maximizing
  * `p_size`. b dominates a ⇔ b is ≤ on price, ≥ on size, and strictly
  * better on at least one; equal rows never dominate each other, so
  * exact ties on both axes all survive.
  *
  * Spark-first shape — the sort-based skyline, not the O(n²)
  * dominance anti-join the oracle spells: a row survives iff
  *   (1) its size is the MAX at its own price (any same-price row with
  *       a strictly larger size dominates it), and
  *   (2) its size strictly exceeds every size seen at a strictly
  *       lower price (a cheaper-or-equal row with ≥ size dominates).
  * (1) is one groupBy(price); (2) is a running max over the DISTINCT-
  * price frame — domain-sized (one row per price point), not
  * corpus-sized, so the single-partition window holds ~|price domain|
  * rows at any scale while the corpus-scale work stays in the groupBy
  * and the final co-partitioned join back on price. The price axis is
  * fixed-point currency with a bounded domain — the same bounded-
  * domain argument q168's quantile walk rests on.
  *
  * Floats: prices are only COMPARED (sort, max, equality) — no
  * arithmetic — so cross-engine agreement is exact.
  */
object Relational15 {

  // ---------------------------------------------------------------- q174

  def q174(spark: SparkSession, dir: String): DataFrame = {
    val part = table(spark, dir, "part")
    val perPrice = part.groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("mx"))
    val wRun = Window.orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perPrice
      .withColumn("run", max(col("mx")).over(wRun))
      .filter(col("run").isNull || col("mx") > col("run"))
      .select(col("price"), col("mx"))
    part
      .join(frontier,
        part("p_retailprice") === frontier("price") &&
        part("p_size") === frontier("mx"))
      .select(col("p_partkey"), col("p_retailprice"),
        col("p_size").cast("long").as("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
  }

  val q174Oracle: String =
    """SELECT a.p_partkey, a.p_retailprice,
      |       CAST(a.p_size AS BIGINT) AS p_size
      |FROM part a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice
      |    AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY a.p_retailprice, a.p_partkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q174_skyline" -> (q174 _))

  val oracles: Map[String, String] = Map(
    "q174_skyline" -> q174Oracle)
}
