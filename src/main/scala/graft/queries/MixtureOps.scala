package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash

/** q106-q109: round-6 fourth widening — the mixture/packing side of a
  * training-data platform, each oracle-gated and integer-deterministic:
  *
  *  - q106 rate-based mixture flattening (Bernoulli-by-hash — the
  *    NO-SHUFFLE sampler, vs q102's exact-quota rank);
  *  - q107 retention cohorts over the events stream;
  *  - q108 largest-remainder (Hamilton) apportionment of an eval
  *    budget across sources, then the actual selection;
  *  - q109 token-budget shard packing via a distributed two-level
  *    prefix sum.
  */
object MixtureOps {

  // ---------------------------------------------------------------- q106

  /** Mixture flattening by sampling RATE: every source is downsampled
    * toward the smallest source's count m — keep a doc iff
    * h60("flat:"||doc_id) % c_source < m. Expected kept ≈ m per source,
    * the decision is a pure function of (doc_id, per-source counts), so
    * the sample is rerun-stable and resumable.
    *
    * This is the complement of q102's exact-quota rank: the quota
    * version guarantees exact counts but pays a per-source window
    * shuffle; the rate version is a MAP-ONLY filter (counts and the min
    * broadcast), which is what you run on 100 TB when ±√m count noise
    * is acceptable. No shuffle ever touches the corpus — the only
    * exchanges aggregate the 20-row source domain.
    */
  def q106(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n_tokens"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
    val mmin = counts.agg(min(col("c")).as("m"))
    docs.join(broadcast(counts), "source")
      .crossJoin(broadcast(mmin))
      .withColumn("keep",
        CrossHash.h60(concat(lit("flat:"), col("doc_id").cast("string")))
          % col("c") < col("m"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .as("kept_tok_sum"))
      .orderBy(col("source"))
  }

  val q106Oracle: String = {
    val h = CrossHash.h60Sql("'flat:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
       |              AS BIGINT) AS n_tokens
       |  FROM documents),
       |cnt AS (SELECT source, count(*) AS c FROM d GROUP BY source),
       |m AS (SELECT min(c) AS m FROM cnt),
       |k AS (
       |  SELECT d.source, d.n_tokens,
       |         (($h) % cnt.c < m.m) AS keep
       |  FROM d JOIN cnt USING (source) CROSS JOIN m)
       |SELECT source, count(*) AS n_total,
       |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
       |         AS kept_tok_sum
       |FROM k GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q107

  /** Purchase-retention cohorts: users cohorted by their FIRST purchase
    * day, then counted per (cohort_day, age_days) for every later day
    * they purchased again — the classic triangular retention matrix,
    * entirely in integer day arithmetic (epoch seconds DIV 86400, both
    * engines).
    *
    * Scale shape: one filtered scan → (user, day) partial+final
    * distinct aggregate → per-user window for the cohort day (single
    * exchange on user_id; the min rides the same sort) → final
    * aggregate on the (cohort, age) domain, whose size grows with the
    * TIME SPAN, not the event volume. After the (user, day) dedup each
    * user contributes at most one row per (cohort, age), so the final
    * count needs no distinct.
    */
  def q107(spark: SparkSession, dir: String): DataFrame = {
    val byDay = table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("unix_timestamp(ts) DIV 86400").as("d"))
      .distinct()
    byDay
      .withColumn("d0", min(col("d")).over(
        Window.partitionBy(col("user_id"))))
      .select(col("d0").as("cohort_day"), (col("d") - col("d0")).as("age_days"))
      .groupBy(col("cohort_day"), col("age_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("age_days"))
  }

  val q107Oracle: String =
    """WITH p AS (
      |  SELECT DISTINCT user_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, d,
      |         min(d) OVER (PARTITION BY user_id) AS d0
      |  FROM p)
      |SELECT d0 AS cohort_day, d - d0 AS age_days, count(*) AS n_users
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q108

  /** Largest-remainder (Hamilton) apportionment of a fixed evaluation
    * budget of [[EvalBudget]] docs across sources — quota_s =
    * floor(N·c_s/T) plus one extra for the L = N − Σfloor largest
    * remainders — followed by the actual deterministic selection
    * (h60-rank within source, q102's machinery). Proportional
    * allocation with an exact total is how eval/holdout sets are sized;
    * floor-only allocation under-fills the budget and naive rounding
    * overshoots it. Every step is integer arithmetic on (c_s, T, N) —
    * both engines apportion identically by construction.
    *
    * Scale shape: the allocation table is source-domain-sized (tiny) —
    * its global remainder-rank window is a deliberate single-partition
    * sort of ~|sources| rows, NOT corpus data. The selection reuses
    * q102's shape: rank ≤ [[EvalBudget]] is a LITERAL bound, so
    * WindowGroupLimit still pushes the partial limit map-side, and the
    * exact per-source quota (a column, unknowable to the optimizer) is
    * applied as a cheap post-filter against the broadcast allocation.
    */
  val EvalBudget = 100

  def q108(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum(col("c")).as("t"))
    val alloc = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($EvalBudget * c) DIV t"))
      .withColumn("rem", expr(s"($EvalBudget * c) % t"))
    val leftover = alloc.agg((lit(EvalBudget.toLong) - sum(col("base"))).as("l"))
    val quotas = alloc.crossJoin(broadcast(leftover))
      .withColumn("rrank", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .withColumn("quota",
        col("base") + when(col("rrank") <= col("l"), 1L).otherwise(0L))
      .select(col("source"), col("c"), col("quota"))
    val sel = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(
          CrossHash.h60(concat(lit("eval:"), col("doc_id").cast("string"))),
          col("doc_id"))))
      .filter(col("rk") <= EvalBudget) // literal → WindowGroupLimit
      .join(broadcast(quotas), "source")
      .filter(col("rk") <= col("quota"))
    sel.groupBy(col("source"))
      .agg(
        max(col("c")).as("n_total"),
        max(col("quota")).as("quota"),
        count(lit(1)).as("n_selected"),
        sum(col("doc_id")).as("sel_id_sum"))
      .orderBy(col("source"))
  }

  val q108Oracle: String = {
    val h = CrossHash.h60Sql("'eval:' || CAST(doc_id AS VARCHAR)")
    s"""WITH cnt AS (
       |  SELECT source, count(*) AS c FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM cnt),
       |alloc AS (
       |  SELECT source, c,
       |         ($EvalBudget * c) // t AS base,
       |         ($EvalBudget * c) % t AS rem
       |  FROM cnt CROSS JOIN tot),
       |lo AS (SELECT $EvalBudget - CAST(sum(base) AS BIGINT) AS l FROM alloc),
       |quotas AS (
       |  SELECT source, c,
       |         base + CASE WHEN row_number()
       |             OVER (ORDER BY rem DESC, source) <= l
       |           THEN 1 ELSE 0 END AS quota
       |  FROM alloc CROSS JOIN lo),
       |rk AS (
       |  SELECT source, doc_id,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY $h, doc_id) AS rk
       |  FROM documents),
       |sel AS (
       |  SELECT rk.source, rk.doc_id, q.c, q.quota
       |  FROM rk JOIN quotas q USING (source)
       |  WHERE rk.rk <= q.quota)
       |SELECT source, CAST(max(c) AS BIGINT) AS n_total,
       |       CAST(max(quota) AS BIGINT) AS quota,
       |       count(*) AS n_selected,
       |       CAST(sum(doc_id) AS BIGINT) AS sel_id_sum
       |FROM sel GROUP BY source ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q109

  /** Token-budget shard packing — the pretraining sharder: documents in
    * doc_id order are packed greedily into shards of [[ShardTokens]]
    * tokens (a doc never splits; a shard closes when the running total
    * crosses the budget), reported as per-shard stats. shard_id =
    * floor(prefix_tokens_before_doc / B), a pure function of the
    * corpus, so shard assignment is reproducible and resumable.
    *
    * The interesting part is HOW the prefix sum distributes: a naive
    * `sum().over(Window.orderBy(doc_id))` is a single-partition global
    * window — the canonical scale killer. This implementation is the
    * classic two-level scan: (1) bucket docs by doc_id DIV
    * [[PackBucket]]; (2) an in-bucket running sum (parallel windows,
    * one per bucket); (3) bucket TOTALS — a table |ids|/bucket rows
    * long — get their own running sum on the (deliberate, tiny) global
    * window; (4) broadcast-join the offsets back. The oracle computes
    * the same numbers with DuckDB's flat single-node cumsum — same
    * semantics, scale-different plan, which is exactly the engine's
    * thesis. At larger id domains PackBucket widens (or the scheme
    * recurses) to keep the offsets table broadcastable.
    */
  val ShardTokens = 2500L
  val PackBucket = 100L

  def q109(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n_tokens"))
      .withColumn("bkt", expr(s"doc_id DIV $PackBucket"))
    val within = docs.withColumn("cum_in",
      sum(col("n_tokens")).over(
        Window.partitionBy(col("bkt")).orderBy(col("doc_id"))))
    val offsets = docs.groupBy(col("bkt"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("off",
        coalesce(
          sum(col("btok")).over(
            Window.orderBy(col("bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bkt"), col("off"))
    within.join(broadcast(offsets), "bkt")
      .withColumn("cum_before", col("off") + col("cum_in") - col("n_tokens"))
      .withColumn("shard_id", expr(s"cum_before DIV $ShardTokens"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))
  }

  val q109Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
       |              AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |         coalesce(sum(n_tokens) OVER (
       |           ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS cum_before
       |  FROM d)
       |SELECT CAST(cum_before // $ShardTokens AS BIGINT) AS shard_id,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum,
       |       CAST(min(doc_id) AS BIGINT) AS first_doc,
       |       CAST(max(doc_id) AS BIGINT) AS last_doc
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q125

  /** q125 base keep rate (permille): an exactly-balanced corpus keeps
    * this fraction of every language; under/over-represented languages
    * scale up (capped at keep-all) / down by the importance ratio.
    */
  val ImpBasePermille: Long = 600L

  /** Importance RESAMPLING to a uniform language target (the
    * DSIR/DoReMi-style mixture-rebalancing primitive; q106's flattening
    * is the special case "target = min count"). The importance weight
    * of a doc is target_share / actual_share of its language; with a
    * base keep rate B that is
    * `w(lang) = least(1000, (B * total) div (n_langs * n_lang))`
    * per-mille, and a doc survives iff
    * `h60('imp:'||doc_id) % 1000 < w(lang)` — RNG-free, rerun-stable,
    * resumable, and the acceptance test never shuffles the corpus.
    *
    * Scale shape: pass 1 is a 5-row language census (windows over the
    * census, never a second corpus pass — the q114 lesson); pass 2
    * re-scans only (lang, doc_id) (column-pruned), broadcast-joins the
    * 5-row weight table, and folds straight into the per-lang
    * acceptance counts. All arithmetic is int64 with truncated div.
    */
  def q125(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val all = Window.partitionBy()
    val weights = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .withColumn("total", sum(col("n_docs")).over(all))
      .withColumn("n_langs", count(lit(1)).over(all))
      .withColumn("weight_permille",
        expr(s"least(1000, ($ImpBasePermille * total)" +
          " div (n_langs * n_docs))"))
      .select(col("lang"), col("n_docs"), col("weight_permille"))
    val accepted = docs.select(col("lang"), col("doc_id"))
      .join(broadcast(weights.select(col("lang"), col("weight_permille"))),
        Seq("lang"))
      .filter(CrossHash.h60(
        concat(lit("imp:"), col("doc_id").cast("string"))) % 1000
        < col("weight_permille"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_accepted"))
    weights.join(accepted, Seq("lang"), "left")
      .withColumn("n_accepted", coalesce(col("n_accepted"), lit(0L)))
      .withColumn("achieved_permille",
        expr("1000 * n_accepted div n_docs"))
      .withColumn("post_share_permille",
        expr("1000 * n_accepted div (sum(n_accepted) over ())"))
      .select(col("lang"), col("n_docs"), col("weight_permille"),
        col("n_accepted"), col("achieved_permille"),
        col("post_share_permille"))
      .orderBy(col("lang"))
  }

  val q125Oracle: String = {
    val h = CrossHash.h60Sql("'imp:' || CAST(doc_id AS VARCHAR)")
    s"""WITH mix AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       |w AS (
       |  SELECT lang, n_docs,
       |         least(1000, ($ImpBasePermille * sum(n_docs) OVER ())
       |               // ((count(*) OVER ()) * n_docs)) AS weight_permille
       |  FROM mix),
       |acc AS (
       |  SELECT d.lang, count(*) AS n_accepted
       |  FROM documents d JOIN w USING (lang)
       |  WHERE ($h) % 1000 < weight_permille
       |  GROUP BY d.lang)
       |SELECT w.lang,
       |       CAST(w.n_docs AS BIGINT) AS n_docs,
       |       CAST(w.weight_permille AS BIGINT) AS weight_permille,
       |       CAST(COALESCE(a.n_accepted, 0) AS BIGINT) AS n_accepted,
       |       CAST(1000 * COALESCE(a.n_accepted, 0)
       |            // w.n_docs AS BIGINT) AS achieved_permille,
       |       CAST(1000 * COALESCE(a.n_accepted, 0)
       |            // (sum(COALESCE(a.n_accepted, 0)) OVER ())
       |            AS BIGINT) AS post_share_permille
       |FROM w LEFT JOIN acc a USING (lang)
       |ORDER BY w.lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_flatten_sample" -> (q106 _),
    "q107_retention_cohorts" -> (q107 _),
    "q108_eval_allocation" -> (q108 _),
    "q109_token_packing" -> (q109 _),
    "q125_importance_sample" -> (q125 _))

  val oracles: Map[String, String] = Map(
    "q106_flatten_sample" -> q106Oracle,
    "q107_retention_cohorts" -> q107Oracle,
    "q108_eval_allocation" -> q108Oracle,
    "q109_token_packing" -> q109Oracle,
    "q125_importance_sample" -> q125Oracle)
}
