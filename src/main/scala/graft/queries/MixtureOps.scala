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

  // ---------------------------------------------------------------- q225

  /** Budget as a fraction of the corpus: B = (Q225BudgetNum · total)
    * DIV 10 — scale-adaptive, so skewed sources exercise the
    * redistribution path at every SF. */
  val Q225BudgetNum = 6L

  /** q225: WATER-FILLING token-budget allocation across sources — the
    * data-mixture construction step (the "how many tokens from each
    * domain" decision behind every pretraining mix; data-constrained
    * scaling work allocates exactly this way: equal shares capped by
    * each domain's capacity, surplus redistributed among the uncapped).
    * The unique maximal uniform level L with Σ min(cᵢ, L) ≤ B has a
    * CLOSED FORM over the capacity-sorted prefix sums — no iteration:
    * cut = max rn with pfᵣₙ + (k − rn)·cᵣₙ ≤ B (sources up to the cut
    * are fully taken), L = (B − pf_cut) DIV (k − cut) for the rest.
    * All arithmetic is exact int64 (exact while B·1 and pf stay below
    * 2^63 — token counts, so any real corpus), and both engines walk
    * the identical sorted frame, so the hash gate certifies the
    * allocator itself. Sub-level integer remainder (< k − cut tokens)
    * is deliberately NOT distributed — the level is the contract.
    *
    * Scale shape: one corpus scan builds (source, token) counts
    * map-side; everything else — sort, prefix sum, cut, level — runs
    * on the SOURCE-sized frame (the single-partition window is over k
    * rows, not the corpus). Output: per-source capacity, allocation,
    * capped flag, and the sampling rate permille a downstream reader
    * would apply.
    */
  def q225(spark: SparkSession, dir: String): DataFrame = {
    val caps = table(spark, dir, "documents")
      .select(col("source"),
        size(expr("filter(split(text, ' '), t -> t <> '')"))
          .cast("long").as("ntok"))
      .groupBy(col("source")).agg(sum(col("ntok")).as("c"))
    waterFill(caps, Q225BudgetNum)
  }

  /** The allocator itself over an arbitrary `(source, c)` capacity
    * frame — factored so specs can drive both regimes (capped + cut)
    * with skewed synthetic capacities; the corpus's balanced sources
    * exercise only the at-level path.
    */
  private[graft] def waterFill(caps0: DataFrame, budgetNum: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // OPTIMIZATION r16 (guide §2.4): caps is source-domain-sized but
    // its subtree is a full corpus aggregate, and the allocator
    // references it from five plan positions (sorted ×3, tot, and the
    // caller's joins) — un-checkpointed, EACH reference replayed the
    // corpus scan (q227's plan showed 11 documents scans; 2 after)
    val caps = caps0.localCheckpoint()
    val wSort = Window.orderBy(col("c"), col("source"))
    val sorted = caps
      .withColumn("rn", row_number().over(wSort).cast("long"))
      .withColumn("pf", sum(col("c")).over(
        wSort.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = caps.agg(count(lit(1)).as("k"), sum(col("c")).as("total"))
      .withColumn("b", expr(s"($budgetNum * total) DIV 10"))
    val cut = sorted.crossJoin(broadcast(tot))
      .filter(col("pf") + (col("k") - col("rn")) * col("c") <= col("b"))
      .agg(max(col("rn")).as("cut"))
    val lvl = broadcast(tot).crossJoin(broadcast(cut))
      .join(sorted.select(col("rn").as("cut"), col("pf").as("pf_cut")),
        Seq("cut"), "left")
      .select(col("k"), col("b"),
        coalesce(col("cut"), lit(0L)).as("cut"),
        coalesce(col("pf_cut"), lit(0L)).as("pf_cut"))
      .withColumn("lvl",
        expr("CASE WHEN cut = k THEN NULL" +
          " ELSE (b - pf_cut) DIV (k - cut) END"))
    sorted.crossJoin(broadcast(lvl.select(col("lvl"))))
      .select(col("source"), col("c").as("tokens_available"),
        expr("CASE WHEN lvl IS NULL THEN c ELSE least(c, lvl) END")
          .as("tokens_allocated"))
      .withColumn("is_capped",
        col("tokens_allocated") === col("tokens_available"))
      .withColumn("rate_permille",
        expr("(1000 * tokens_allocated) DIV tokens_available"))
      .orderBy(col("source"))
  }

  /** The allocator's DuckDB CTE chain, expecting a prior CTE
    * `caps(source, c)` and ending in `alloc(source, tokens_available,
    * tokens_allocated, is_capped, rate_permille)` — shared by the q225
    * and q227 oracles (single-copy rule).
    */
  private val waterFillCtes: String =
    s"""tot AS (
       |  SELECT count(*) AS k, CAST(sum(c) AS BIGINT) AS total,
       |         ($Q225BudgetNum * CAST(sum(c) AS BIGINT)) // 10 AS b
       |  FROM caps),
       |sorted AS (
       |  SELECT source, c,
       |         CAST(row_number() OVER (ORDER BY c, source) AS BIGINT) AS rn,
       |         CAST(sum(c) OVER (ORDER BY c, source
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pf
       |  FROM caps),
       |cut AS (
       |  SELECT max(rn) AS cut FROM sorted, tot
       |  WHERE pf + (k - rn) * c <= b),
       |lvl AS (
       |  SELECT CASE WHEN coalesce(cut.cut, 0) = tot.k THEN NULL
       |              ELSE (tot.b - coalesce(s.pf, 0))
       |                   // (tot.k - coalesce(cut.cut, 0)) END AS lvl
       |  FROM tot CROSS JOIN cut
       |  LEFT JOIN sorted s ON s.rn = cut.cut),
       |alloc AS (
       |  SELECT s.source,
       |         s.c AS tokens_available,
       |         CAST(CASE WHEN l.lvl IS NULL THEN s.c
       |                   ELSE least(s.c, l.lvl) END AS BIGINT)
       |           AS tokens_allocated,
       |         (CASE WHEN l.lvl IS NULL THEN s.c
       |               ELSE least(s.c, l.lvl) END) = s.c AS is_capped,
       |         CAST((1000 * CASE WHEN l.lvl IS NULL THEN s.c
       |                           ELSE least(s.c, l.lvl) END) // s.c AS BIGINT)
       |           AS rate_permille
       |  FROM sorted s CROSS JOIN lvl l)""".stripMargin

  val q225Oracle: String =
    s"""WITH caps AS (
       |  SELECT source, CAST(sum(len(list_filter(
       |           string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS c
       |  FROM documents GROUP BY source),
       |$waterFillCtes
       |SELECT source, tokens_available, tokens_allocated, is_capped,
       |       rate_permille
       |FROM alloc ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q227

  /** q227: the MIXTURE MANIFEST — q225's allocation made actionable:
    * each source's water-filled token target drives a deterministic
    * h60-mod rate sampler (the q106 mechanism — keep a doc iff
    * h60('mix:'||doc_id) mod 1000 < rate_permille), so the output is
    * the reproducible recipe a training-data exporter executes: per
    * source the target, the sampled doc/token volumes, and the achieved
    * rate. Sampling is per-DOC with a corpus-independent hash, so the
    * manifest is stable under corpus growth within a source (a doc's
    * verdict never depends on other docs) — the property epoch-based
    * exporters need for incremental re-exports.
    *
    * Scale shape: one corpus scan (doc token counts), the allocator on
    * the source-sized frame, one broadcast join back, one keyed
    * aggregate. The sampled token volume tracks the target in
    * EXPECTATION (hash-uniform rate sampling); the gate certifies the
    * exact verdict set, the spec checks the tracking.
    */
  def q227(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CrossHash
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(expr("filter(split(text, ' '), t -> t <> '')"))
          .cast("long").as("ntok"))
    val caps = docs.groupBy(col("source")).agg(sum(col("ntok")).as("c"))
    val alloc = waterFill(caps, Q225BudgetNum)
    val sampled = docs
      .join(broadcast(alloc.select(col("source"), col("rate_permille"))),
        "source")
      .withColumn("keep",
        CrossHash.h60(concat(lit("mix:"), col("doc_id").cast("string")))
          % 1000L < col("rate_permille"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("keep"), col("ntok")).otherwise(0L))
          .as("sampled_tokens"))
    // alloc is source-domain-sized at any corpus size (guide §3.1):
    // broadcast replaces the report join's SortMergeJoin
    sampled.join(broadcast(alloc), "source")
      .select(col("source"), col("tokens_available"),
        col("tokens_allocated"), col("rate_permille"),
        col("n_docs"), col("n_sampled"), col("sampled_tokens"))
      .withColumn("achieved_permille",
        expr("(1000 * sampled_tokens) DIV tokens_available"))
      .orderBy(col("source"))
  }

  val q227Oracle: String = {
    val h = graft.functions.CrossHash.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(string_split(text, ' '),
       |                              t -> t <> '')) AS BIGINT) AS ntok
       |  FROM documents),
       |caps AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS c
       |         FROM d GROUP BY source),
       |$waterFillCtes,
       |k AS (
       |  SELECT d.source, d.ntok, ($h) % 1000 < a.rate_permille AS keep
       |  FROM d JOIN alloc a USING (source)),
       |agg AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_sampled,
       |         CAST(sum(CASE WHEN keep THEN ntok ELSE 0 END) AS BIGINT)
       |           AS sampled_tokens
       |  FROM k GROUP BY source)
       |SELECT a.source, a.tokens_available, a.tokens_allocated,
       |       a.rate_permille, g.n_docs, g.n_sampled, g.sampled_tokens,
       |       CAST((1000 * g.sampled_tokens) // a.tokens_available AS BIGINT)
       |         AS achieved_permille
       |FROM alloc a JOIN agg g USING (source)
       |ORDER BY a.source""".stripMargin
  }

  // ---------------------------------------------------------------- q165

  /** Total sampling budget (documents drawn) for the mixture. */
  val MixBudget = 1000000L

  /** q165: temperature-scaled source mixture (α = 1/2, the standard
    * multilingual-LM reweighting): each source's sampling weight is
    * proportional to √(token volume), flattening the natural
    * distribution so low-resource sources are oversampled. Integer
    * discipline: isqrt = floor(√n) (IEEE sqrt is correctly rounded, so
    * floor agrees cross-engine for n < 2⁵²), weights in permille by
    * truncated division, the [[MixBudget]]-doc quota and the
    * per-source oversampling factor (quota·1000 DIV n_docs) likewise.
    *
    * Scale shape: one partial-aggregated pass builds the per-source
    * (n_docs, n_tokens) table — the only corpus-scale work; the
    * √-reweighting, window total, quota, and sort all run on a
    * source-count-sized frame (broadcast-trivial at any SF).
    */
  def q165(spark: SparkSession, dir: String): DataFrame = {
    val bySource = table(spark, dir, "documents")
      .select(col("source"),
        expr("CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT)")
          .as("dl"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tokens"))
      .withColumn("isq",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    bySource
      .withColumn("isq_total", sum(col("isq")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("isq * 1000 DIV isq_total").as("weight_permille"),
        expr(s"$MixBudget * isq DIV isq_total").as("quota"),
        expr(s"($MixBudget * isq DIV isq_total) * 1000 DIV n_docs")
          .as("over_permille"))
      .orderBy(col("source"))
  }

  val q165Oracle: String =
    s"""WITH s AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(len(list_filter(string_split(text, ' '),
       |           t -> t <> ''))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |w AS (
       |  SELECT source, n_docs, n_tokens,
       |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS isq
       |  FROM s),
       |t AS (SELECT *, CAST(sum(isq) OVER () AS BIGINT) AS isq_total FROM w)
       |SELECT source, n_docs, n_tokens,
       |       CAST(isq * 1000 // isq_total AS BIGINT) AS weight_permille,
       |       CAST($MixBudget * isq // isq_total AS BIGINT) AS quota,
       |       CAST(($MixBudget * isq // isq_total) * 1000 // n_docs AS BIGINT)
       |         AS over_permille
       |FROM t ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q102

  /** Per-source quota sampling — the mixture balancer: every source
    * contributes at most [[MixQuota]] documents, selected by a
    * deterministic hash rank (so the subset is stable under reruns and
    * independent of input order), reported as per-source totals vs kept
    * stats. This is how a pretraining mix caps an over-represented
    * domain without a random() that would differ per engine and per
    * run.
    *
    * Scale shape: totals are one partial+final aggregate; the quota
    * rank is a row_number filtered to ≤ quota, which Spark plans with
    * WindowGroupLimit pushdown — each map partition forwards at most
    * `quota` rows per source to the window exchange, so the shuffle
    * carries O(quota × partitions) per source, NOT the corpus. The
    * totals-side join key (source) is low-cardinality and tiny — AQE
    * broadcasts it.
    */
  val MixQuota = 10

  def q102(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n_tokens"))
    val totals = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"), sum(col("n_tokens")).as("tok_total"))
    val w = Window.partitionBy(col("source"))
      .orderBy(
        CrossHash.h60(concat(lit("mix:"), col("doc_id").cast("string"))),
        col("doc_id"))
    val kept = docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= MixQuota)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("kept_id_sum"),
        sum(col("n_tokens")).as("kept_tok_sum"))
    totals.join(kept, "source")
      .select(col("source"), col("n_total"), col("tok_total"),
        col("n_kept"), col("kept_id_sum"), col("kept_tok_sum"))
      .orderBy(col("source"))
  }

  val q102Oracle: String = {
    val h = CrossHash.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
       |              AS BIGINT) AS n_tokens
       |  FROM documents),
       |tot AS (
       |  SELECT source, count(*) AS n_total,
       |         CAST(sum(n_tokens) AS BIGINT) AS tok_total
       |  FROM d GROUP BY source),
       |rk AS (
       |  SELECT source, doc_id, n_tokens,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY $h, doc_id) AS rk
       |  FROM d),
       |kept AS (
       |  SELECT source, count(*) AS n_kept,
       |         CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
       |         CAST(sum(n_tokens) AS BIGINT) AS kept_tok_sum
       |  FROM rk WHERE rk <= $MixQuota GROUP BY source)
       |SELECT tot.source, n_total, tok_total, n_kept, kept_id_sum,
       |       kept_tok_sum
       |FROM tot JOIN kept USING (source) ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q59

  /** Deterministic bounded sample per group ("reservoir" without RNG
    * state): rank rows inside each language by a salted content hash and
    * keep the first 5. Retry-stable and partition-order independent —
    * at 100 TB this is the only sane way to take a fixed-size peek at
    * every group in one shuffle.
    */
  def q59(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(
        CrossHash.h60(concat(lit("rsv:"), col("doc_id").cast("string"))),
        col("doc_id"))
    table(spark, dir, "documents")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))
  }

  val q59Oracle: String = {
    val h = CrossHash.h60Sql("'rsv:' || CAST(doc_id AS VARCHAR)")
    s"""SELECT lang, rk, doc_id, n_chars FROM (
       |  SELECT lang, doc_id, n_chars,
       |         CAST(row_number() OVER (PARTITION BY lang
       |                                 ORDER BY $h, doc_id) AS BIGINT) AS rk
       |  FROM documents)
       |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin
  }

  // ---------------------------------------------------------------- q56

  /** Deterministic stratified sampling — the reproducible alternative to
    * rand()-based sampling for training-data curation: keep a row iff
    * h60(salt || doc_id) % 100 < rate(lang), with per-language rates
    * (downsample the dominant language, keep the scarce ones). Pure
    * narrow filter — no shuffle, no RNG state, stable under retries,
    * partition-order independent: exactly what a 100 TB curation job
    * needs for resumability. sum(doc_id) pins the exact membership.
    */
  private val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 30, "de" -> 60, "es" -> 60, "fr" -> 60, "zh" -> 90)

  def q56(spark: SparkSession, dir: String): DataFrame = {
    val rate = SampleRates.foldRight(lit(50): org.apache.spark.sql.Column) {
      case ((l, r), acc) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    table(spark, dir, "documents")
      .withColumn("bucket",
        CrossHash.h60(concat(lit("smp:"), col("doc_id").cast("string"))) % 100)
      .filter(col("bucket") < rate)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("id_min"),
        max(col("doc_id")).as("id_max"))
      .orderBy(col("lang"))
  }

  val q56Oracle: String = {
    val h = CrossHash.h60Sql("'smp:' || CAST(doc_id AS VARCHAR)")
    val rate = SampleRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 50 END")
    s"""SELECT lang, count(*) AS n_sampled,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       min(doc_id) AS id_min, max(doc_id) AS id_max
       |FROM documents
       |WHERE ($h) % 100 < ($rate)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_flatten_sample" -> (q106 _),
    "q107_retention_cohorts" -> (q107 _),
    "q108_eval_allocation" -> (q108 _),
    "q109_token_packing" -> (q109 _),
    "q125_importance_sample" -> (q125 _),
    "q225_token_budget" -> (q225 _),
    "q227_mixture_manifest" -> (q227 _),
    "q165_temperature_mix" -> (q165 _),
    "q102_domain_quota" -> (q102 _),
    "q59_group_sample" -> (q59 _),
    "q56_stratified_sample" -> (q56 _))

  val oracles: Map[String, String] = Map(
    "q106_flatten_sample" -> q106Oracle,
    "q107_retention_cohorts" -> q107Oracle,
    "q108_eval_allocation" -> q108Oracle,
    "q109_token_packing" -> q109Oracle,
    "q125_importance_sample" -> q125Oracle,
    "q225_token_budget" -> q225Oracle,
    "q227_mixture_manifest" -> q227Oracle,
    "q165_temperature_mix" -> q165Oracle,
    "q102_domain_quota" -> q102Oracle,
    "q59_group_sample" -> q59Oracle,
    "q56_stratified_sample" -> q56Oracle)
}
