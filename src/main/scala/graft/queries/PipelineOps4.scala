package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash.h60Sql

/** q88-q89: corpus-statistics and contamination operators for
  * training-data curation — global top-k n-grams and train/test
  * n-gram-overlap detection.
  */
object PipelineOps4 {

  // ---------------------------------------------------------------- q88

  /** Global top-20 word bigrams with counts — the corpus-statistics
    * primitive behind boilerplate detection and stop-phrase lists.
    * Scale shape: the bigram explode is a narrow projection; the count
    * is a partial (map-side) + final hash aggregate keyed on the bigram
    * string, and the top-k is TakeOrderedAndProject — per-partition
    * heaps, only 20 rows per partition reach the driver-side merge; no
    * global sort ever materializes. Tie-break is total (count desc,
    * bigram asc) so the cut is deterministic cross-engine.
    */
  def q88(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(20)

  val q88Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, tok, pos FROM (
      |    SELECT doc_id,
      |           unnest(string_split(text, ' ')) AS tok,
      |           generate_subscripts(string_split(text, ' '), 1) AS pos
      |    FROM documents) t
      |  WHERE tok <> ''),
      |big AS (
      |  SELECT tok || ' ' || lead(tok, 1) OVER w AS bigram
      |  FROM toks
      |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
      |SELECT bigram, count(*) AS cnt
      |FROM big WHERE bigram IS NOT NULL
      |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q89

  /** Train/test contamination check: which held-out docs (doc_id % 10
    * = 7) share at least one 5-word shingle with the training split?
    * The canonical eval-integrity scan before an LLM training run.
    *
    * Scale shape: shingles are hashed to 60 bits BEFORE the join, so
    * the shuffle key is 8 bytes, never the shingle text; the train side
    * is collapsed to distinct hashes (map-side combine) and the inner
    * join on the hash is the semi-join — both sides hash-partitioned on
    * the same key, one shuffle each. A false positive needs a 60-bit
    * collision, and both engines compute the identical hash, so the
    * result is still deterministic cross-engine. At 100 TB the train
    * side's distinct-hash set can also seed a bloom filter pushed into
    * the test-side scan as a prefilter.
    */
  def q89(spark: SparkSession, dir: String): DataFrame = {
    def shingleHashes(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
        .filter(size(col("toks")) >= 5)
        // round 6: shingle construction + hashing fused in the native
        // WordShingles60 (no per-window concat_ws lambda, no shingle
        // strings); array_distinct now dedups the 8-byte hashes
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.WordShingles60.wordShingles60(col("toks"), 5)))
          .as("h"))
    val docs = table(spark, dir, "documents")
    val trainH = shingleHashes(docs.filter(col("doc_id") % 10 =!= 7))
      .select(col("h")).distinct()
    shingleHashes(docs.filter(col("doc_id") % 10 === 7))
      .join(trainH, "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_shared"))
      .orderBy(col("doc_id"))
  }

  val q89Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE tok <> ''),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
       |               || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS shingle
       |    FROM toks
       |    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) s
       |  WHERE shingle IS NOT NULL),
       |hs AS (SELECT doc_id, ${h60Sql("shingle")} AS h FROM sh),
       |train AS (SELECT DISTINCT h FROM hs WHERE doc_id % 10 <> 7),
       |test AS (SELECT doc_id, h FROM hs WHERE doc_id % 10 = 7)
       |SELECT t.doc_id, count(DISTINCT t.h) AS n_shared
       |FROM test t JOIN train tr ON t.h = tr.h
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------- q90

  /** Morton (z-order) key distribution over lineitem's
    * (partkey, suppkey) plane: z-encode each row, then histogram the
    * 256 top-level z-cells. The interleave is pure built-in bitwise
    * arithmetic ([[graft.functions.ZOrder]]) — one narrow codegen'd
    * projection feeding a partial+final hash agg on a 256-value key.
    * The layout payoff (file skipping for 2-D box predicates when the
    * table is range-written on z) is proven in ZOrderLayoutSpec; this
    * query gates the encoding itself cross-engine.
    */
  def q90(spark: SparkSession, dir: String): DataFrame = {
    val z = graft.functions.ZOrder.interleave16(
      col("l_partkey") % 4096, col("l_suppkey") % 4096)
    table(spark, dir, "lineitem")
      .select(z.as("z"))
      .groupBy(shiftrightunsigned(col("z"), 16).as("z_cell"))
      .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"),
        max(col("z")).as("z_max"))
      .orderBy(col("z_cell"))
  }

  val q90Oracle: String = {
    val z = graft.functions.ZOrder.interleave16Sql(
      "CAST(l_partkey % 4096 AS BIGINT)", "CAST(l_suppkey % 4096 AS BIGINT)")
    s"""WITH zt AS (SELECT $z AS z FROM lineitem)
       |SELECT z >> 16 AS z_cell, count(*) AS n, min(z) AS z_min,
       |       max(z) AS z_max
       |FROM zt GROUP BY z >> 16 ORDER BY z_cell""".stripMargin
  }

  // ---------------------------------------------------------------- q91

  /** Bloom-prefiltered semi-join under the oracle gate: lineitems of
    * high-value orders via [[graft.ops.ScaleOps.bloomSemiJoin]] — the
    * bloom drops non-matching rows inside the probe side's scan stage
    * before any shuffle, the exact semi-join then removes the bloom's
    * false positives, so the oracle is the PLAIN `IN (subquery)`
    * formulation. Aggregate output is all-integer (count / distinct
    * counts), bit-equal cross-engine.
    */
  def q91(spark: SparkSession, dir: String): DataFrame = {
    val hot = table(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000.0)
    // auto-sized overload: the bloom is sized from the build side's
    // measured count at WHATEVER scale factor runs (a fixed literal
    // saturates at larger sfs and stops filtering; the oversized 1M
    // default measured 3.9 s vs 1.6 s at sf0.1 — sizing matters both
    // directions)
    graft.ops.ScaleOps.bloomSemiJoin(
      table(spark, dir, "lineitem"), hot, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))
  }

  val q91Oracle: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |       count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_totalprice > 150000.0)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q92

  /** Pure interval-overlap join (NO equi key) via
    * [[graft.ops.IntervalJoin.overlapJoin]]: overlap degree of
    * high-value orders' fulfillment windows [orderdate, orderdate +
    * orderkey%30 days]. Without the bucket reformulation Spark plans
    * this as BroadcastNestedLoopJoin — IntervalJoinSpec pins the plan
    * to the equi-join shape. The oracle runs DuckDB's native
    * inequality join over the same windows.
    */
  def q92(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "orders")
      .filter(col("o_totalprice") > 450000)
    def windows(keyName: String, sName: String, eName: String) = base.select(
      col("o_orderkey").as(keyName),
      unix_date(col("o_orderdate").cast("date")).cast("long").as(sName),
      (unix_date(col("o_orderdate").cast("date")) + col("o_orderkey") % 30)
        .cast("long").as(eName))
    // auto-sized overload: bucketWidth ≈ the measured p50 window length
    // (a hard-coded width breaks silently when interval scale changes —
    // 1000× wider intervals would explode 1000× more bucket rows)
    graft.ops.IntervalJoin.overlapJoin(
        windows("a_orderkey", "a_s", "a_e"),
        windows("b_orderkey", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e")
      .filter(col("a_orderkey") =!= col("b_orderkey"))
      .groupBy(col("a_orderkey"))
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy(col("a_orderkey"))
  }

  val q92Oracle: String =
    """WITH hi AS (
      |  SELECT o_orderkey,
      |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
      |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |           + o_orderkey % 30 AS e
      |  FROM orders WHERE o_totalprice > 450000)
      |SELECT a.o_orderkey AS a_orderkey, count(*) AS n_overlaps
      |FROM hi a JOIN hi b
      |  ON a.o_orderkey <> b.o_orderkey AND a.s <= b.e AND b.s <= a.e
      |GROUP BY a.o_orderkey ORDER BY a_orderkey""".stripMargin

  // ---------------------------------------------------------------- q93

  /** Heavy-hitter tokens via the Space-Saving sketch
    * ([[graft.functions.SpaceSaving]]) — the bounded-memory twin of an
    * exact token count: each partition ships at most `capacity`
    * (item, count, err) triples regardless of vocabulary size.
    * Approximate and partitioning-dependent within its error bound, so
    * it is in the declared oracle-free set (driver rows-only check,
    * same policy as q38's sketches); the bounds themselves are asserted
    * in SpaceSavingSpec, and at sf0.01 the capacity comfortably exceeds
    * the heavy vocabulary so counts are exact.
    */
  def q93(spark: SparkSession, dir: String): DataFrame = {
    val ss = udaf(new graft.functions.SpaceSaving(256))
    table(spark, dir, "documents")
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("tok"))
      .agg(ss(col("tok")).as("hits"))
      .select(explode(col("hits")).as("h"))
      .select(col("h.item").as("token"), col("h.count").as("est_count"),
        col("h.err").as("err"))
      .orderBy(col("est_count").desc, col("token"))
      .limit(16)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_ngram_topk" -> (q88 _),
    "q89_contamination" -> (q89 _),
    "q90_zorder" -> (q90 _),
    "q91_bloom_semijoin" -> (q91 _),
    "q92_interval_overlap" -> (q92 _),
    "q93_heavy_hitters" -> (q93 _))

  val oracles: Map[String, String] = Map(
    "q88_ngram_topk" -> q88Oracle,
    "q89_contamination" -> q89Oracle,
    "q90_zorder" -> q90Oracle,
    "q91_bloom_semijoin" -> q91Oracle,
    "q92_interval_overlap" -> q92Oracle)
}
