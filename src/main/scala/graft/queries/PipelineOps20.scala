package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.{CrossHash, VectorOps}

/** Round-10 pack #8: ranking/selection/model-evaluation readouts the
  * curation families still lacked — the Mann-Whitney AUC of the quality
  * score (q243), a held-out Kneser-Ney bigram LM evaluation (q244), the
  * token-budget quality threshold (q245), the embedding alignment audit
  * (q246), and the context-length padding-waste curve (q247).
  */
object PipelineOps20 {

  // ---------------------------------------------------------------- q243

  /** q243: Mann-Whitney AUC of the quality score as a DUPLICATION
    * predictor — the one-number ranking summary of q232's calibration
    * curve (q232 shows the per-bin dup rate; this answers "across ALL
    * thresholds, how well does q_u3 rank duplicated above unique
    * content?"). AUC = P(score_dup > score_unique) + ½·P(tie), computed
    * by the rank-sum identity over the bounded (q_u3, label) histogram
    * — never a pairwise pass: u2 = Σ_s pos(s)·(2·cumneg(<s) + neg(s))
    * doubles the U statistic so ties stay integer. 500‰ = score is
    * uninformative; < 500‰ = quality ANTI-predicts duplication (the
    * expected direction for boilerplate-heavy dup farms).
    *
    * Scale shape: one corpus scan + the q232 fingerprint window (count
    * per md5 fp, co-partitioned); everything after lands on the ≤ 1001
    * row score histogram (the single-partition cumsum window is over
    * that bounded frame, not the corpus — the q225 contract). Int64
    * budget: the permille step computes 1000·u2 with u2 ≤ 2·n_pos·
    * n_neg, so exactness holds while n_pos·n_neg < ~4.6·10¹⁵ — any
    * corpus below ~6·10⁷ docs per class, ~10⁹ docs when dups are a
    * few percent; beyond that drop the permille factor into the
    * divisor first (the q189 documented-bound discipline).
    *
    * Regime coverage: sf0.01 has zero exact dups (n_pos = 0, NULL AUC
    * — the degenerate path), sf0.1 has 16 — the two hash gates
    * TOGETHER pin both branches (the CapActivitySpec pattern), and the
    * spec brute-forces the active regime pairwise.
    */
  def q243(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val w = Window.partitionBy(col("fp"))
    val hist = Dedup.withQualU3(docs)
      .withColumn("fp", md5(col("text")))
      .withColumn("n_fp", count(lit(1)).over(w))
      .select(col("q_u3"),
        when(col("n_fp") > 1, 1L).otherwise(0L).as("pos"))
      .groupBy(col("q_u3"))
      .agg(sum(col("pos")).as("pos"), sum(lit(1L) - col("pos")).as("neg"))
    val ws = Window.orderBy(col("q_u3"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cumneg", sum(col("neg")).over(ws) - col("neg"))
      .agg(
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("cumneg") + col("neg"))).as("u2"))
      .withColumn("auc_permille",
        expr("(1000 * u2) div nullif(2 * n_pos * n_neg, 0)"))
      .select(col("n_pos"), col("n_neg"), col("u2"), col("auc_permille"))
  }

  val q243Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH docsq AS (
       |  SELECT text, $qualSql AS q_u3
       |  FROM (
       |    SELECT text, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |d AS (
       |  SELECT q_u3,
       |         CASE WHEN count(*) OVER (PARTITION BY md5(text)) > 1
       |              THEN 1 ELSE 0 END AS pos
       |  FROM docsq),
       |hist AS (
       |  SELECT q_u3, CAST(sum(pos) AS BIGINT) AS pos,
       |         CAST(sum(1 - pos) AS BIGINT) AS neg
       |  FROM d GROUP BY q_u3),
       |c AS (
       |  SELECT pos, neg,
       |         CAST(sum(neg) OVER (ORDER BY q_u3
       |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) - neg AS cumneg
       |  FROM hist)
       |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
       |       CAST(sum(neg) AS BIGINT) AS n_neg,
       |       CAST(sum(pos * (2 * cumneg + neg)) AS BIGINT) AS u2,
       |       (1000 * CAST(sum(pos * (2 * cumneg + neg)) AS BIGINT)) //
       |         nullif(2 * CAST(sum(pos) AS BIGINT) *
       |                    CAST(sum(neg) AS BIGINT), 0) AS auc_permille
       |FROM c""".stripMargin
  }

  // ---------------------------------------------------------------- q244

  /** q244: HELD-OUT Kneser-Ney bigram evaluation — the LM-quality
    * readout q223 cannot give: q223 self-scores (train = score), so it
    * never meets an unseen bigram and needs no smoothing; this trains
    * on the `train` split (the q114 id-hash) and scores `val`+`test`
    * bigrams, where unseen events are the POINT — interpolated
    * Kneser-Ney (absolute discount D = 3/4) backs them off to the
    * continuation distribution (how many distinct contexts a word
    * completes), the smoothing every production n-gram scorer
    * (CCNet's KenLM) ships.
    *
    * Everything is integer-exact: with D = 3/4, P(cur|prev) is the
    * rational num/den with num = Nbt·(4·c(prev,cur) − 3)⁺ +
    * 3·N1+(prev·)·N1+(·cur), den = 4·c(prev)·Nbt (Nbt = distinct train
    * bigram types), and the bit-surprisal floor(log₂(den/num)) =
    * bitlen(den div num) − 1 exactly (the q223 bit-length identity
    * lifted from integers to rationals — valid because num ≤ den, i.e.
    * P ≤ 1, which KN guarantees termwise). Unseen contexts (and the
    * measure-zero num = 0 corner) take the documented floor
    * P₀ = 1/(4·Nbt). Exact while c(prev)·Nbt < 2⁶¹ — any one model
    * shard in practice; beyond that the den literally overflows int64
    * and a production scorer shards the model per language anyway.
    *
    * Scale shape: one scan builds train bigram counts (the MODEL —
    * bigram-type-sized, orders below the corpus; localCheckpoint'ed
    * because four consumers read it: context counts, continuation
    * counts, the type total, and the eval join — the q230 rule; and
    * memoized per (session, dir) in [[knModel]], since the streaming
    * scorer reads the identical artifact);
    * context/continuation/Nbt all reduce from that frame, never a
    * second corpus pass. The eval pass is the second scan, joining the
    * model on its natural keys under AQE; per-lang totals land on the
    * language domain.
    */
  /** Per-doc bigram instances `(doc_id, lang[, split], prev, cur)` of
    * any documents-shaped frame — THE single copy of the bigram
    * tokenization + pairing (q223's self-scored LM, q244's KN train and
    * eval sides, and [[graft.streaming.StreamingKnScore]]'s live
    * batches all pair through it, so no two LM consumers can disagree
    * on what a bigram is). `withSplit = false` skips the per-doc
    * id-hash entirely — the streaming scorer and q223 never read it,
    * so they should not pay the md5 per document.
    */
  private[graft] def bigramsOf(
      docs: DataFrame, withSplit: Boolean = true): DataFrame = {
    val base =
      if (withSplit) docs.select(col("doc_id"), col("lang"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"),
        PipelineOps9.splitOf(col("doc_id")).as("split"))
      else docs.select(col("doc_id"), col("lang"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
    val keep = Seq(col("doc_id"), col("lang")) ++
      (if (withSplit) Seq(col("split")) else Nil)
    base
      .filter(size(col("toks")) >= 2)
      .select(keep :+ explode(expr(
        "transform(slice(toks, 2, size(toks) - 1)," +
          " (x, i) -> struct(element_at(toks, i + 1) AS prev, x AS cur))"))
        .as("bg"): _*)
      .select(keep :+ col("bg.prev").as("prev") :+
        col("bg.cur").as("cur"): _*)
  }

  /** The trained KN model: bigram counts, context counts + distinct
    * continuations per context, distinct-context counts per word, and
    * the 1-row bigram-type total. */
  private[graft] case class KnModel(
      bc: DataFrame, ctx: DataFrame, cont: DataFrame, nbt: DataFrame)

  private val knCache =
    scala.collection.concurrent.TrieMap.empty[String, KnModel]

  /** Memoized per (session, dir): the KN bigram model trained on the
    * `train` split (the q218 trainedMerges pattern — the model is an
    * ARTIFACT; q244 and the streaming scorer must read the same one).
    * Only `bc` is materialized; the three reductions derive from it.
    */
  private[graft] def knModel(spark: SparkSession, dir: String): KnModel =
    knCache.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}:$dir", {
        val bc = bigramsOf(table(spark, dir, "documents"))
          .filter(col("split") === "train")
          .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("bcnt"))
          .localCheckpoint()
        KnModel(
          bc,
          bc.groupBy(col("prev"))
            .agg(sum(col("bcnt")).as("ccnt"), count(lit(1)).as("n1p")),
          bc.groupBy(col("cur")).agg(count(lit(1)).as("cont")),
          bc.agg(count(lit(1)).as("nbt")))
      })

  /** Scores a bigram frame `(…, prev, cur)` against a [[KnModel]],
    * appending the exact integer bit-surprisal `surp` plus the `ccnt`/
    * `bcnt` join results (NULL-ness encodes the unseen-context /
    * unseen-bigram cases the caller counts). THE single scorer copy —
    * batch q244 and the streaming twin both flow through it.
    */
  private[graft] def scoreKn(ev: DataFrame, m: KnModel): DataFrame = ev
    .join(m.bc, Seq("prev", "cur"), "left")
    .join(m.ctx, Seq("prev"), "left")
    .join(m.cont, Seq("cur"), "left")
    .crossJoin(broadcast(m.nbt))
    .withColumn("num",
      expr("nbt * (CASE WHEN bcnt IS NULL THEN 0 ELSE 4 * bcnt - 3 END)" +
        " + 3 * n1p * coalesce(cont, 0)"))
    .withColumn("surp", expr(
      """CASE WHEN ccnt IS NULL OR num <= 0
        |     THEN length(bin(4 * nbt)) - 1
        |     ELSE length(bin((4 * ccnt * nbt) div num)) - 1 END"""
        .stripMargin).cast("long"))

  def q244(spark: SparkSession, dir: String): DataFrame = {
    val ev = bigramsOf(table(spark, dir, "documents"))
      .filter(col("split") =!= "train")
    scoreKn(ev, knModel(spark, dir))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("ccnt").isNull, 1L).otherwise(0L)).as("n_oov_ctx"),
        sum(when(col("ccnt").isNotNull && col("bcnt").isNull, 1L)
          .otherwise(0L)).as("n_unseen"),
        sum(col("surp")).as("sum_surp"))
      .withColumn("surp_permille", expr("(1000 * sum_surp) div n_bigrams"))
      .orderBy(col("lang"))
  }

  val q244Oracle: String = {
    val h = CrossHash.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT lang,
       |         CASE WHEN $h % 1000 < ${PipelineOps9.SplitTrainUpto}
       |              THEN 'train' ELSE 'eval' END AS split,
       |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents),
       |bigr AS (
       |  SELECT lang, split, toks[i] AS prev, toks[i + 1] AS cur
       |  FROM d, unnest(range(1, len(toks))) AS u(i)
       |  WHERE len(toks) >= 2),
       |bc AS MATERIALIZED (
       |  SELECT prev, cur, count(*) AS bcnt FROM bigr
       |  WHERE split = 'train' GROUP BY prev, cur),
       |ctx AS (
       |  SELECT prev, CAST(sum(bcnt) AS BIGINT) AS ccnt,
       |         count(*) AS n1p
       |  FROM bc GROUP BY prev),
       |co AS (SELECT cur, count(*) AS cont FROM bc GROUP BY cur),
       |nb AS (SELECT count(*) AS nbt FROM bc),
       |ev AS (
       |  SELECT e.lang, c.ccnt, b.bcnt,
       |         nbt * (CASE WHEN b.bcnt IS NULL THEN 0
       |                     ELSE 4 * b.bcnt - 3 END)
       |           + 3 * c.n1p * COALESCE(o.cont, 0) AS num,
       |         nb.nbt AS nbt
       |  FROM bigr e
       |  LEFT JOIN bc b ON e.prev = b.prev AND e.cur = b.cur
       |  LEFT JOIN ctx c ON e.prev = c.prev
       |  LEFT JOIN co o ON e.cur = o.cur
       |  CROSS JOIN nb
       |  WHERE e.split <> 'train'),
       |sc AS (
       |  SELECT lang, ccnt, bcnt,
       |         CAST(CASE WHEN ccnt IS NULL OR num <= 0
       |              THEN length(bin(4 * nbt)) - 1
       |              ELSE length(bin((4 * ccnt * nbt) // num)) - 1 END
       |           AS BIGINT) AS surp
       |  FROM ev)
       |SELECT lang, count(*) AS n_bigrams,
       |       CAST(sum(CASE WHEN ccnt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_oov_ctx,
       |       CAST(sum(CASE WHEN ccnt IS NOT NULL AND bcnt IS NULL
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
       |       CAST(sum(surp) AS BIGINT) AS sum_surp,
       |       (1000 * CAST(sum(surp) AS BIGINT)) // count(*)
       |         AS surp_permille
       |FROM sc GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q245

  /** Token budget as a fraction of each language's volume: numerator
    * over 10 (3 → keep the top-quality 30% of tokens). */
  val Q245BudgetNum = 3L

  /** q245: TOKEN-BUDGET quality threshold — q241 asks "which score cut
    * is fair across languages?"; this asks the question the budget
    * owner actually has: "what is the LOOSEST quality cut whose
    * selection still fits the token budget?" (select by tokens, not
    * docs — pretraining buys tokens). Per language: the maximal q_u3
    * cut whose ≥-cut selection carries at least
    * [[Q245BudgetNum]]/10 of the language's tokens, the selection's
    * doc/token volume, and the overshoot permille (the granularity
    * cost of cutting at a score boundary — a weighted-quantile
    * readout, so it is exact where a sampled quantile would not be).
    *
    * Scale shape: one corpus scan → the bounded (lang, q_u3) token
    * histogram (≤ langs×1001 rows, localCheckpoint'ed — the q230/q241
    * rule); the descending cumsum, crossing search, and report all run
    * on that frame. Integer end to end: cut = max q with
    * cum_tokens(≥ q) ≥ target, target = (num·total) div 10.
    */
  def q245(spark: SparkSession, dir: String): DataFrame = {
    val hist = Dedup.withQualU3(
        table(spark, dir, "documents")
          .withColumn("n_chars", length(col("text")).cast("long"))
          .withColumn("ntok",
            size(expr("filter(split(text, ' '), t -> t <> '')"))
              .cast("long")))
      .groupBy(col("lang"), col("q_u3"))
      .agg(count(lit(1)).as("docs"), sum(col("ntok")).as("toks"))
      .localCheckpoint()
    val wd = Window.partitionBy(col("lang")).orderBy(col("q_u3").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.partitionBy(col("lang"))
    hist
      .withColumn("cum_toks", sum(col("toks")).over(wd))
      .withColumn("cum_docs", sum(col("docs")).over(wd))
      .withColumn("target",
        expr(s"($Q245BudgetNum * sum(toks) over" +
          s" (partition by lang)) div 10"))
      .withColumn("tot_toks", sum(col("toks")).over(wl))
      .withColumn("tot_docs", sum(col("docs")).over(wl))
      .groupBy(col("lang"))
      .agg(
        max(col("tot_docs")).as("n_docs"),
        max(col("tot_toks")).as("n_tokens"),
        max(col("target")).as("target_tokens"),
        max(when(col("cum_toks") >= col("target"), col("q_u3"))).as("cut_q"),
        min(when(col("cum_toks") >= col("target"), col("cum_docs")))
          .as("sel_docs"),
        min(when(col("cum_toks") >= col("target"), col("cum_toks")))
          .as("sel_tokens"))
      .withColumn("overshoot_permille",
        expr("(1000 * (sel_tokens - target_tokens)) div" +
          " nullif(target_tokens, 0)"))
      .orderBy(col("lang"))
  }

  val q245Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH docsq AS (
       |  SELECT lang, ntok, $qualSql AS q_u3
       |  FROM (
       |    SELECT lang, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS ntok,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |hist AS (
       |  SELECT lang, q_u3, count(*) AS docs,
       |         CAST(sum(ntok) AS BIGINT) AS toks
       |  FROM docsq GROUP BY 1, 2),
       |c AS (
       |  SELECT lang, q_u3, docs, toks,
       |         CAST(sum(toks) OVER (PARTITION BY lang ORDER BY q_u3 DESC
       |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks,
       |         CAST(sum(docs) OVER (PARTITION BY lang ORDER BY q_u3 DESC
       |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
       |         ($Q245BudgetNum * CAST(sum(toks) OVER (PARTITION BY lang)
       |                                AS BIGINT)) // 10 AS target,
       |         CAST(sum(toks) OVER (PARTITION BY lang) AS BIGINT)
       |           AS tot_toks,
       |         CAST(sum(docs) OVER (PARTITION BY lang) AS BIGINT)
       |           AS tot_docs
       |  FROM hist)
       |SELECT lang, max(tot_docs) AS n_docs, max(tot_toks) AS n_tokens,
       |       max(target) AS target_tokens,
       |       max(CASE WHEN cum_toks >= target THEN q_u3 END) AS cut_q,
       |       min(CASE WHEN cum_toks >= target THEN cum_docs END)
       |         AS sel_docs,
       |       min(CASE WHEN cum_toks >= target THEN cum_toks END)
       |         AS sel_tokens,
       |       (1000 * (min(CASE WHEN cum_toks >= target THEN cum_toks END)
       |                - max(target))) // nullif(max(target), 0)
       |         AS overshoot_permille
       |FROM c GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q246

  /** q246 baseline panel predicate: ≤ 100 vectors at any corpus size
    * (the q228 fixed-panel rule; 29 is coprime to the q228 17 so the
    * two panels don't alias). */
  val AlignPanelMod = 29L
  val AlignPanelMax = 2900L

  /** q246: embedding ALIGNMENT audit (Wang & Isola's alignment side,
    * arXiv:2005.10242) — are the pairs the sign-LSH index proposes
    * actually CLOSE, relative to how far random vectors sit? Reports
    * the candidate pairs' exact quantized squared-L2 mean against a
    * fixed random panel's all-pairs mean, and their ratio: an index
    * whose alignment_permille ≈ 1000 is proposing random pairs (broken
    * banding); a useful one sits far below. The uniformity side of the
    * paper's pair (log E exp(−2d²)) is deliberately replaced by the
    * baseline MEAN — exp is a transcendental the two engines need not
    * round identically, while every number here is exact int64 (the
    * q228 quantization discipline), so the hash gate certifies the
    * audit itself.
    *
    * Composes THE q42 banding ([[Similarity2.signBands]] +
    * [[Similarity2.bucketPairs]], the single pairing copy) over the %4
    * sample RESTRICTED to the 64-dim contract — auditing a
    * reimplementation would certify nothing, but the exact int64 d²
    * needs equal dims, so the audit covers the fixed-dim subset of
    * q42's index and a ragged tail (none in the gate corpora) is
    * outside its scope, exactly as for q228/q233.
    *
    * Scale shape: banded self-join (never all-pairs) for positives; a
    * ≤ 100-vector broadcast panel (≤ 4950 pairs, constant at any
    * corpus size) for the baseline; both fold d² in-projection and
    * land on 1-row aggregates. The ratio divides the integer MEANS
    * (each ≤ 64·(2·10⁴)² ≈ 2.6·10¹⁰), so no product can overflow.
    */
  def q246(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .filter(size(col("embedding")) === 64)
    val sample = emb.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
    val qs = sample.select(col("vec_id"),
      VectorOps.quantize(col("embedding"), PipelineOps9.EmbQScale).as("qv"))
    val bands = Similarity2.signBands(sample)
    val pos = Similarity2.bucketPairs(bands, bands)
      .filter(col("va") < col("vb"))
      .join(qs.select(col("vec_id").as("va"), col("qv").as("qa")), "va")
      .join(qs.select(col("vec_id").as("vb"), col("qv").as("qb")), "vb")
      .select(VectorOps.intSqDist(col("qa"), col("qb")).as("d2"))
      .agg(count(lit(1)).as("n_pos_pairs"), sum(col("d2")).as("s_pos"))
    val panel = emb
      .filter(col("vec_id") % AlignPanelMod === 0 &&
        col("vec_id") < AlignPanelMax)
      .select(col("vec_id"),
        VectorOps.quantize(col("embedding"), PipelineOps9.EmbQScale)
          .as("qv"))
    val base = panel.as("a")
      .join(broadcast(panel.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(VectorOps.intSqDist(col("a.qv"), col("b.qv")).as("d2"))
      .agg(count(lit(1)).as("n_base_pairs"), sum(col("d2")).as("s_base"))
    pos.crossJoin(broadcast(base))
      .select(
        col("n_pos_pairs"),
        expr("s_pos div nullif(n_pos_pairs, 0)").as("mean_pos_d2"),
        col("n_base_pairs"),
        expr("s_base div nullif(n_base_pairs, 0)").as("mean_base_d2"),
        expr("(1000 * (s_pos div nullif(n_pos_pairs, 0))) div" +
          " nullif(s_base div nullif(n_base_pairs, 0), 0)")
          .as("alignment_permille"))
  }

  val q246Oracle: String = {
    s"""WITH sample AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE len(embedding) = 64 AND vec_id % 4 = 0),
       |${Similarity2.bandsCtesSql},
       |${Similarity2.candCteSql()},
       |qs AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e ->
       |           CAST(floor(CAST(e AS DOUBLE) * ${PipelineOps9.EmbQScale})
       |                AS BIGINT)) AS qv
       |  FROM sample),
       |pos AS (
       |  SELECT count(*) AS n_pos_pairs,
       |         CAST(sum(CAST(list_sum(list_transform(range(1, 65),
       |             i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
       |           AS BIGINT)) AS BIGINT) AS s_pos
       |  FROM (SELECT va, vb FROM cand WHERE va < vb) c
       |  JOIN qs a ON c.va = a.vec_id
       |  JOIN qs b ON c.vb = b.vec_id),
       |panel AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e ->
       |           CAST(floor(CAST(e AS DOUBLE) * ${PipelineOps9.EmbQScale})
       |                AS BIGINT)) AS qv
       |  FROM embeddings
       |  WHERE len(embedding) = 64 AND vec_id % $AlignPanelMod = 0
       |    AND vec_id < $AlignPanelMax),
       |base AS (
       |  SELECT count(*) AS n_base_pairs,
       |         CAST(sum(CAST(list_sum(list_transform(range(1, 65),
       |             i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
       |           AS BIGINT)) AS BIGINT) AS s_base
       |  FROM panel a JOIN panel b ON a.vec_id < b.vec_id)
       |SELECT n_pos_pairs,
       |       s_pos // nullif(n_pos_pairs, 0) AS mean_pos_d2,
       |       n_base_pairs,
       |       s_base // nullif(n_base_pairs, 0) AS mean_base_d2,
       |       (1000 * (s_pos // nullif(n_pos_pairs, 0))) //
       |         nullif(s_base // nullif(n_base_pairs, 0), 0)
       |         AS alignment_permille
       |FROM pos CROSS JOIN base""".stripMargin
  }

  // ---------------------------------------------------------------- q247

  /** Context lengths the packing-efficiency curve is evaluated at. */
  val CtxLens: Seq[Long] = Seq(512L, 1024L, 2048L, 4096L)

  /** q247: PADDING-WASTE curve — the cost of the naive "one document
    * per sequence, pad to context length" batching that q109's packer
    * exists to avoid, measured at the standard context lengths. Per
    * ctx: sequences emitted (each doc contributes ceil(ntok/ctx) — the
    * overflow chunks are full, only the last pads), total padded slots,
    * and waste permille. The curve is the evidence for HOW MUCH packing
    * buys at each context length — waste grows with ctx under naive
    * batching, which is exactly why long-context training packs.
    *
    * Scale shape: ONE corpus scan computes all four context lengths'
    * sequence counts as map-side sums in a single aggregate; the
    * 1-row → 4-row unpivot happens after. Integer end to end
    * (ceil(n/c) = (n + c − 1) div c).
    */
  def q247(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = table(spark, dir, "documents")
      .select(size(expr("filter(split(text, ' '), t -> t <> '')"))
        .cast("long").as("ntok"))
    val aggCols =
      Seq(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens")) ++
        CtxLens.map(c =>
          sum(expr(s"(ntok + ${c - 1}) div $c")).as(s"seqs_$c"))
    val one = perDoc.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs =
      CtxLens.map(c => s"${c}L, seqs_$c").mkString(", ")
    one.select(
        expr(s"stack(${CtxLens.size}, $stackArgs) AS (ctx_len, n_seqs)"),
        col("n_docs"), col("n_tokens"))
      .withColumn("padded_tokens", expr("n_seqs * ctx_len"))
      .withColumn("waste_permille",
        expr("(1000 * (padded_tokens - n_tokens)) div padded_tokens"))
      .select(col("ctx_len"), col("n_docs"), col("n_tokens"),
        col("n_seqs"), col("padded_tokens"), col("waste_permille"))
      .orderBy(col("ctx_len"))
  }

  val q247Oracle: String = {
    val seqSums = CtxLens.map(c =>
      s"CAST(sum((ntok + ${c - 1}) // $c) AS BIGINT) AS seqs_$c")
      .mkString(",\n       |         ")
    val arms = CtxLens.map(c =>
      s"SELECT CAST($c AS BIGINT) AS ctx_len, n_docs, n_tokens," +
        s" seqs_$c AS n_seqs FROM a").mkString("\n  UNION ALL\n  ")
    s"""WITH d AS (
       |  SELECT len(list_filter(string_split(text, ' '), t -> t <> ''))
       |           AS ntok
       |  FROM documents),
       |a AS (
       |  SELECT count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
       |         $seqSums
       |  FROM d),
       |u AS (
       |  $arms)
       |SELECT ctx_len, n_docs, n_tokens, n_seqs,
       |       n_seqs * ctx_len AS padded_tokens,
       |       (1000 * (n_seqs * ctx_len - n_tokens)) //
       |         (n_seqs * ctx_len) AS waste_permille
       |FROM u ORDER BY ctx_len""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q243_quality_auc" -> (q243 _),
    "q244_kn_heldout" -> (q244 _),
    "q245_budget_quality_cut" -> (q245 _),
    "q246_alignment_audit" -> (q246 _),
    "q247_padding_waste" -> (q247 _))

  val oracles: Map[String, String] = Map(
    "q243_quality_auc" -> q243Oracle,
    "q244_kn_heldout" -> q244Oracle,
    "q245_budget_quality_cut" -> q245Oracle,
    "q246_alignment_audit" -> q246Oracle,
    "q247_padding_waste" -> q247Oracle)
}
