package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash
import graft.functions.CrossHash.{h60Sql, universalSql}
import graft.functions.MinHashAggregator
import graft.ops.ScaleOps

/** q46-q47: the custom typed Aggregator and the salted-join scale
  * technique, pushed through the DuckDB gate so the driver itself
  * certifies them — not just ScalaTest.
  */
object Advanced {

  // ---------------------------------------------------------------- q46

  /** MinHash signatures via the one-pass [[MinHashAggregator]] UDAF
    * (buffer = 8 longs per doc regardless of shingle count), rendered as
    * a comparable string. The oracle recomputes the same signature with
    * eight `min()` aggregates over the identical universal-hash family —
    * so the UDAF's merge/reduce logic is verified value-by-value by a
    * different engine.
    */
  private val SigWidth = 8

  def q46(spark: SparkSession, dir: String): DataFrame = {
    val shingleHashes = table(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.WordShingles60.wordShingles60(col("toks"), 3)))
        .as("h"))
    val mh = udaf(new MinHashAggregator(SigWidth))
    shingleHashes
      .groupBy(col("doc_id"))
      .agg(mh(col("h")).as("sig"))
      .select(col("doc_id"),
        expr("array_join(transform(sig, e -> cast(e as string)), ',')")
          .as("signature"))
      .orderBy(col("doc_id"))
  }

  val q46Oracle: String = {
    val minhashes = (0 until SigWidth)
      .map(j => s"CAST(min(${universalSql("h", j)}) AS VARCHAR)")
      .mkString(" || ',' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents WHERE doc_id % 5 = 0) t
       |  WHERE tok <> ''),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
       |    FROM toks
       |    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) s
       |  WHERE shingle IS NOT NULL),
       |hs AS (SELECT doc_id, ${h60Sql("shingle")} AS h FROM sh)
       |SELECT doc_id, $minhashes AS signature
       |FROM hs GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q47

  /** The salted join itself under the gate: lineitem ⋈ supplier through
    * [[ScaleOps.saltedJoin]] (8 salt buckets), aggregated per nation.
    * The oracle runs the PLAIN join — identical output certifies that
    * salting is a pure physical rewrite.
    */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = table(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
    val supplier = table(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    ScaleOps.saltedJoin(lineitem, supplier, "l_suppkey", 8)
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("nationkey"))
  }

  val q47Oracle: String =
    """SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
      |       count(*) AS n_items,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_price
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q214

  /** q214: the BUCKETED co-located join under the gate — q47's
    * companion for the other scale knob the brief names: both sides
    * are written `bucketBy(8, key)` + `sortBy` into warehouse tables
    * ([[ScaleOps.writeBucketed]]), and the subsequent join is
    * SHUFFLE-FREE (bucket-local; ScaleOpsSpec pins zero Exchange nodes
    * in the plan) — at 100 TB this is the difference between a join
    * that moves both tables over the network every run and one that
    * reads co-located files. The oracle runs the PLAIN join over the
    * original parquet — identical output certifies that bucketing is a
    * pure physical layout choice, exactly the q47 salting contract.
    * The write cost is the point: pay one layout pass, then every
    * subsequent join on that key is exchange-free.
    *
    * Both sides carry a MERGE hint: under the gate's default confs the
    * small customer side would be broadcast, which never exercises the
    * bucket layout at all — the hint forces the sort-merge path the
    * layout exists for (shuffle-free because both sides are bucketed
    * and sorted on the join key). ScaleOpsSpec pins q214's OWN plan:
    * a SortMergeJoin with no Exchange on either join key. The scratch
    * warehouse is a stable per-process path + overwrite (the ADVICE-r3
    * rule — a fresh createTempDirectory per invocation leaks one /tmp
    * copy of both tables per bench/verify run).
    */
  def q214(spark: SparkSession, dir: String): DataFrame = {
    val wh = SourceSink.scratchDir("q214_bucketed")
    val o = ScaleOps.writeBucketed(
      table(spark, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice")),
      "o_custkey", 8, "graft_q214_orders", s"$wh/orders")
    val c = ScaleOps.writeBucketed(
      table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
      "c_custkey", 8, "graft_q214_customer", s"$wh/customer")
    spark.table(o).hint("merge")
      .join(spark.table(c).hint("merge"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("nationkey"))
  }

  val q214Oracle: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_minhash_udaf" -> (q46 _),
    "q47_salted_join" -> (q47 _),
    "q214_bucketed_join" -> (q214 _))

  val oracles: Map[String, String] = Map(
    "q46_minhash_udaf" -> q46Oracle,
    "q47_salted_join" -> q47Oracle,
    "q214_bucketed_join" -> q214Oracle)
}
