package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-10 pack #4: the evaluation/curation shapes the 227-query
  * surface still lacked — embedding-space decontamination (q228), a
  * stateless format-preserving training-order permutation (q229),
  * rank correlation between quality signals (q230), chance-corrected
  * classifier agreement (q231), and the quality-vs-duplication
  * calibration curve (q232).
  */
object PipelineOps16 {

  // ---------------------------------------------------------------- q228

  /** Squared-L2 leak threshold in quantized units: on the corpus's
    * unit-norm vectors, d² = (2 − 2·cos)·QScale², so cos ≥ 0.4 ⇔
    * d² ≤ 1.2·10⁸ — active at both gate SFs (measured min-to-panel d²
    * spans 0.8–1.5·10⁸ there), and EXACT: the comparison is int64 vs
    * int64, no float boundary to straddle.
    */
  val SemLeakD2Max = 120000000L

  /** q228: SEMANTIC decontamination — the embedding-space member of
    * the leakage family (q89/q120/q162/q166 catch lexical overlap; a
    * paraphrased benchmark answer shares no n-gram and sails through
    * all four, but its embedding is still near the benchmark's). The
    * held-out panel is a FIXED set (vec_id % 17 = 0 AND vec_id < 1700,
    * ≤ 100 vectors at any corpus size — the q103/q192 fixed-panel
    * rule), every other vector gets its EXACT int64 min quantized
    * squared-L2 distance to the panel (floor(x·10⁴) quantization, the
    * q119/q128 discipline — no float anywhere, so the hash gate
    * certifies the decontaminator itself), and vectors within
    * [[SemLeakD2Max]] are flagged as contamination-suspect.
    *
    * Scale shape: the panel is BROADCAST; the corpus makes ONE pass
    * (panel×corpus pair rows, linear in the corpus), folding each pair
    * to one int64 inside the projection — no corpus self-join, no
    * shuffle before the label-sized aggregate. Int64 budget: |qa−qb| ≤
    * 2·10⁴ ⇒ pair d² ≤ 64·4·10⁸ ≈ 2.6·10¹⁰ ≪ 2⁶³. Dims are pinned to
    * 64 on BOTH engines by the same filter, so a ragged vector can't
    * fork a NULL-vs-skip difference.
    */
  /** The 64-dim quantized frame `(vec_id, label, qv)` — q228's input
    * shape, shared with [[graft.streaming.StreamingSemDecontam]] so the
    * batch and streaming decontaminators quantize identically.
    */
  private[graft] def quantized64(emb: DataFrame): DataFrame = emb
    .filter(size(col("embedding")) === 64)
    .select(col("vec_id"), col("label").cast("long").as("label"),
      graft.functions.VectorOps
        .quantize(col("embedding"), PipelineOps9.EmbQScale).as("qv"))

  /** q228's panel membership predicate (on `vec_id`). */
  private[graft] def isSemPanel(vecId: Column): Column =
    vecId % 17 === 0 && vecId < 1700

  /** Per-vector exact min quantized squared-L2 to the broadcast panel:
    * `(vec_id, label, min_d2)`. One corpus pass, pairs folded to int64
    * in-projection. The single definition both q228 and the streaming
    * twin score with.
    */
  private[graft] def minD2ToPanel(corpus: DataFrame, panel: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(panel))
      .select(col("vec_id"), col("label"),
        graft.functions.VectorOps.intSqDist(col("qv"), col("pv")).as("d2"))
      .groupBy(col("vec_id"), col("label"))
      .agg(min(col("d2")).as("min_d2"))

  def q228(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized64(table(spark, dir, "embeddings"))
    val panel = q.filter(isSemPanel(col("vec_id")))
      .select(col("vec_id").as("p_id"), col("qv").as("pv"))
    val corpus = q.filter(not(isSemPanel(col("vec_id"))))
    minD2ToPanel(corpus, panel)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("min_d2") <= SemLeakD2Max, 1L).otherwise(0L))
          .as("n_leaked"),
        min(col("min_d2")).as("closest_d2"))
      .withColumn("leak_permille", expr("(1000 * n_leaked) div n_vecs"))
      .select(col("label"), col("n_vecs"), col("n_leaked"),
        col("leak_permille"), col("closest_d2"))
      .orderBy(col("label"))
  }

  val q228Oracle: String =
    s"""WITH q AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |         list_transform(embedding, e ->
       |           CAST(floor(CAST(e AS DOUBLE) * ${PipelineOps9.EmbQScale})
       |                AS BIGINT)) AS qv
       |  FROM embeddings WHERE len(embedding) = 64),
       |panel AS (
       |  SELECT vec_id AS p_id, qv AS pv FROM q
       |  WHERE vec_id % 17 = 0 AND vec_id < 1700),
       |corpus AS (
       |  SELECT * FROM q WHERE NOT (vec_id % 17 = 0 AND vec_id < 1700)),
       |d AS (
       |  SELECT c.vec_id, c.label,
       |         min(CAST(list_sum(list_transform(range(1, 65),
       |             i -> (c.qv[i] - p.pv[i]) * (c.qv[i] - p.pv[i])))
       |           AS BIGINT)) AS min_d2
       |  FROM corpus c CROSS JOIN panel p GROUP BY 1, 2)
       |SELECT label, count(*) AS n_vecs,
       |       CAST(sum(CASE WHEN min_d2 <= $SemLeakD2Max THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_leaked,
       |       (1000 * CAST(sum(CASE WHEN min_d2 <= $SemLeakD2Max
       |                             THEN 1 ELSE 0 END) AS BIGINT))
       |         // count(*) AS leak_permille,
       |       min(min_d2) AS closest_d2
       |FROM d GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q229

  /** Feistel rounds; 3 suffice for a bijection (this is a shuffle, not
    * a cipher — the adversary is sort bias, not cryptanalysis). */
  val FeistelRounds = 3

  /** Half-domain modulus: 2²⁰, so the full permutation domain is
    * [0, 2⁴⁰) — ids beyond it raise loudly (the q84/Exact guard
    * discipline; never a silent wrong answer). */
  val FM20 = 1048576L

  /** Knuth multiplicative constant + per-round offsets for the round
    * function F(h, r) = (h·[[FMult]] + r·[[FAddR]] + [[FAddC]]) mod
    * [[FM20]]. h < 2²⁰ keeps h·FMult < 2⁵² — inside int64. */
  val FMult = 2654435761L
  val FAddR = 40503L
  val FAddC = 40699L

  /** Rows reported by q229 (the head of the training order). */
  val TrainOrderTop = 100

  /** q229: deterministic TRAINING-ORDER permutation — a 3-round
    * Feistel network over id halves (format-preserving encryption's
    * construction) maps every doc_id to a unique pseudo-random
    * position in [0, 2⁴⁰). This is how a 100 TB corpus gets "shuffled"
    * without ever materializing a shuffle: the position is a STATELESS
    * per-row bijection (modular-add Feistel — each round
    * (l, h) → (h, (l + F(h, r)) mod 2²⁰) is invertible), so an
    * exporter range-partitions on `pos` directly, reruns are
    * byte-stable, and incrementally added docs slot into fixed
    * positions without re-shuffling the corpus — none of which holds
    * for ORDER BY rand(). Every step is integer mod/mul/add, identical
    * in both engines, so the hash gate certifies the permutation
    * arithmetic itself; the spec pins bijectivity + invertibility.
    *
    * Scale shape: a pure narrow projection (whole-stage codegen) and a
    * global top-[[TrainOrderTop]] (TakeOrderedAndProject — per-
    * partition heads, never a full sort).
    */
  def q229(spark: SparkSession, dir: String): DataFrame = {
    val guarded = when(
      col("doc_id") >= 0L && col("doc_id") < (1L << 40), col("doc_id"))
      .otherwise(raise_error(concat(
        lit("q229: doc_id "), col("doc_id").cast("string"),
        lit(" outside the 2^40 Feistel domain — widen FM20"))))
    var df = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), guarded.as("gid"))
      .withColumn("l0", expr(s"gid div $FM20"))
      .withColumn("h0", expr(s"gid % $FM20"))
    for (r <- 1 to FeistelRounds) {
      df = df
        .withColumn(s"l$r", col(s"h${r - 1}"))
        .withColumn(s"h$r", expr(
          s"(l${r - 1} + (h${r - 1} * $FMult + $r * $FAddR + $FAddC)" +
            s" % $FM20) % $FM20"))
    }
    df.select(
        (col(s"l$FeistelRounds") * FM20 + col(s"h$FeistelRounds")).as("pos"),
        col("doc_id"), col("lang"))
      .orderBy(col("pos"))
      .limit(TrainOrderTop)
  }

  val q229Oracle: String = {
    val rounds = (1 to FeistelRounds).map { r =>
      s"""r$r AS (
         |  SELECT doc_id, lang, h${r - 1} AS l$r,
         |         (l${r - 1} + (h${r - 1} * $FMult + $r * $FAddR + $FAddC)
         |          % $FM20) % $FM20 AS h$r
         |  FROM r${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH r0 AS (
       |  SELECT doc_id, lang, doc_id // $FM20 AS l0, doc_id % $FM20 AS h0
       |  FROM documents),
       |$rounds
       |SELECT CAST(l$FeistelRounds * $FM20 + h$FeistelRounds AS BIGINT) AS pos,
       |       doc_id, lang
       |FROM r$FeistelRounds ORDER BY pos LIMIT $TrainOrderTop""".stripMargin
  }

  // ---------------------------------------------------------------- q230

  /** q230: SPEARMAN rank correlation between two quality signals —
    * does doc length predict alphabetic cleanliness? Rank statistics
    * are the standard report for signal-redundancy analysis (Pearson
    * on raw values is driven by outliers; ranks are not), but the
    * naive ranking is a corpus-wide sort. Both signals here live on
    * SMALL integer domains (token count, alpha-permille ≤ 1000), so
    * the midranks come from a cumulative walk over the bounded
    * (lang, value) HISTOGRAM — the q168 quantile trick applied to
    * ranking: no corpus sort at any scale. Doubled midranks
    * (2·below + count + 1) are exact int64, both engines derive them
    * from identical histograms, and ρ = Pearson over the midranks
    * (the tie-corrected Spearman identity). The moment sums stay
    * int64-exact (bound: per-lang n < 2²⁰ keeps Σm² < 4n³ < 2⁶²; a
    * bigger corpus needs two-level sums — the q189 documentation
    * discipline) and only the final combination runs in DOUBLE with
    * the same single correctly-rounded IEEE ops on both engines
    * (variances clamped at 0 so a constant signal yields NULL, not
    * NaN). `sxy` is emitted exactly so the gate pins the integer
    * moment, not just the rounded ρ.
    *
    * Scale shape: ONE corpus scan into the bounded joint (lang, x, y)
    * histogram — every later consumer (both marginal histograms, the
    * midrank join-back, the moments) re-aggregates THAT frame, whose
    * shuffle Catalyst reuses across the three branches (identical
    * exchange subtree — unlike a bare corpus projection, which each
    * consumer would re-scan; the q114 lesson applied one level up).
    * Moments are weighted by the joint cell count, so they equal the
    * per-doc sums exactly.
    */
  def q230(spark: SparkSession, dir: String): DataFrame = {
    val joint = table(spark, dir, "documents")
      .select(col("lang"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("x"),
        expr("(1000 * cast(length(regexp_replace(text, '[^a-z]', '')) as bigint))" +
          " div length(text)").as("y"))
      .groupBy(col("lang"), col("x"), col("y"))
      .agg(count(lit(1)).as("cnt"))
      // bounded (|x-domain|·|y-domain| per lang); materialized so all
      // three consumers read it instead of racing AQE stage reuse —
      // measured: without this, two of the three branches still paid
      // the corpus scan (parallel stage submission defeats reuse)
      .localCheckpoint()
    def midranks(vcol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("lang")).orderBy(col(vcol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joint.groupBy(col("lang"), col(vcol)).agg(sum(col("cnt")).as("c"))
        .withColumn("cum", sum(col("c")).over(w))
        .select(col("lang"), col(vcol),
          (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L)).as(out))
    }
    joint.join(broadcast(midranks("x", "ax")), Seq("lang", "x"))
      .join(broadcast(midranks("y", "ay")), Seq("lang", "y"))
      .groupBy(col("lang"))
      .agg(
        sum(col("cnt")).as("n"),
        sum(col("cnt") * col("ax")).as("sx"),
        sum(col("cnt") * col("ay")).as("sy"),
        sum(col("cnt") * col("ax") * col("ax")).as("sxx"),
        sum(col("cnt") * col("ay") * col("ay")).as("syy"),
        sum(col("cnt") * col("ax") * col("ay")).as("sxy"))
      .select(col("lang"), col("n").as("n_docs"), col("sxy"),
        expr("round((cast(n as double) * sxy - cast(sx as double) * sy) /" +
          " nullif(sqrt(greatest(cast(n as double) * sxx -" +
          " cast(sx as double) * sx, 0)) *" +
          " sqrt(greatest(cast(n as double) * syy -" +
          " cast(sy as double) * sy, 0)), 0), 6)").as("spearman_rho"))
      .orderBy(col("lang"))
  }

  val q230Oracle: String =
    """WITH f AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
      |              AS BIGINT) AS x,
      |         (1000 * length(regexp_replace(text, '[^a-z]', '', 'g')))
      |           // length(text) AS y
      |  FROM documents),
      |hx AS (SELECT lang, x, count(*) AS c FROM f GROUP BY 1, 2),
      |mx AS (
      |  SELECT lang, x,
      |         CAST(2 * (sum(c) OVER (PARTITION BY lang ORDER BY x
      |                  ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT)
      |           AS ax
      |  FROM hx),
      |hy AS (SELECT lang, y, count(*) AS c FROM f GROUP BY 1, 2),
      |my AS (
      |  SELECT lang, y,
      |         CAST(2 * (sum(c) OVER (PARTITION BY lang ORDER BY y
      |                  ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS BIGINT)
      |           AS ay
      |  FROM hy),
      |j AS (
      |  SELECT f.lang, mx.ax, my.ay
      |  FROM f
      |  JOIN mx ON mx.lang = f.lang AND mx.x = f.x
      |  JOIN my ON my.lang = f.lang AND my.y = f.y),
      |mo AS (
      |  SELECT lang, count(*) AS n,
      |         CAST(sum(ax) AS BIGINT) AS sx, CAST(sum(ay) AS BIGINT) AS sy,
      |         CAST(sum(ax * ax) AS BIGINT) AS sxx,
      |         CAST(sum(ay * ay) AS BIGINT) AS syy,
      |         CAST(sum(ax * ay) AS BIGINT) AS sxy
      |  FROM j GROUP BY lang)
      |SELECT lang, n AS n_docs, sxy,
      |       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |             nullif(sqrt(greatest(CAST(n AS DOUBLE) * sxx -
      |                         CAST(sx AS DOUBLE) * sx, 0)) *
      |                    sqrt(greatest(CAST(n AS DOUBLE) * syy -
      |                         CAST(sy AS DOUBLE) * sy, 0)), 0), 6)
      |         AS spearman_rho
      |FROM mo ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q231

  /** q231: COHEN'S KAPPA of the marker langid against the labeled
    * truth — the chance-corrected agreement score (raw accuracy is
    * meaningless under class imbalance: predicting the majority class
    * everywhere can score 90%; κ scores it 0). Shares the classifier
    * with q25 through [[TextAnalysis.langidPredicted]] (single-copy
    * rule), reduces the corpus to the tiny confusion matrix in one
    * aggregate, and computes κ entirely on that matrix in exact int64:
    * κ_permille = 1000·(n·agree − pe_num) div (n² − pe_num) with
    * pe_num = Σₖ rowₖ·colₖ. Exact while 1000·n² < 2⁶³ ⇔ n < 9.6·10⁷
    * docs; beyond that, permille-quantize the margins first (the q189
    * documentation discipline). The exact `pe_num` rides along so the
    * gate pins the margin products, not just the final ratio.
    *
    * Scale shape: one corpus scan into a ≤ 6×6 confusion matrix;
    * everything after runs on that matrix (margins, products, κ) — at
    * 100 TB the post-scan cost is constant.
    */
  def q231(spark: SparkSession, dir: String): DataFrame = {
    val conf = TextAnalysis.langidPredicted(spark, dir)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("c"))
      // ≤ 6×6 rows; materialized so the three margin consumers don't
      // re-scan the corpus (the q230 lesson)
      .localCheckpoint()
    val tot = conf.agg(
      sum(col("c")).as("n"),
      sum(when(col("lang") === col("predicted"), col("c")).otherwise(0L))
        .as("agree"))
    val rowt = conf.select(col("lang").as("k"), col("c"))
      .groupBy(col("k")).agg(sum(col("c")).as("rt"))
    val colt = conf.select(col("predicted").as("k"), col("c"))
      .groupBy(col("k")).agg(sum(col("c")).as("ct"))
    val pe = rowt.join(colt, Seq("k"))
      .agg(coalesce(sum(col("rt") * col("ct")), lit(0L)).as("pe_num"))
    tot.crossJoin(pe)
      .select(
        col("n").as("n_docs"), col("agree").as("n_agree"), col("pe_num"),
        expr("(1000 * agree) div n").as("po_permille"),
        expr("(1000 * pe_num) div (n * n)").as("pe_permille"),
        expr("(1000 * (n * agree - pe_num)) div nullif(n * n - pe_num, 0)")
          .as("kappa_permille"))
      .orderBy(col("n_docs"))
  }

  val q231Oracle: String =
    s"""WITH ${TextAnalysis.langidPredCtes},
       |conf AS (
       |  SELECT lang, predicted, count(*) AS c
       |  FROM pred GROUP BY lang, predicted),
       |tot AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN lang = predicted THEN c ELSE 0 END)
       |              AS BIGINT) AS agree
       |  FROM conf),
       |rowt AS (SELECT lang AS k, CAST(sum(c) AS BIGINT) AS rt
       |         FROM conf GROUP BY lang),
       |colt AS (SELECT predicted AS k, CAST(sum(c) AS BIGINT) AS ct
       |         FROM conf GROUP BY predicted),
       |pe AS (
       |  SELECT CAST(coalesce(sum(rt * ct), 0) AS BIGINT) AS pe_num
       |  FROM rowt JOIN colt USING (k))
       |SELECT n AS n_docs, agree AS n_agree, pe_num,
       |       (1000 * agree) // n AS po_permille,
       |       (1000 * pe_num) // (n * n) AS pe_permille,
       |       (1000 * (n * agree - pe_num)) // nullif(n * n - pe_num, 0)
       |         AS kappa_permille
       |FROM tot, pe ORDER BY n_docs""".stripMargin

  // ---------------------------------------------------------------- q232

  /** q232: the quality→duplication CALIBRATION curve — does the q156
    * keep-policy quality score actually separate duplicated from
    * unique content? Docs land in fixed-width quality bins
    * (q_u3 div 100 over the integer 0..1000 score — fixed bins, never
    * a corpus-quantile pass) and each bin reports its exact-duplicate
    * rate (md5 whole-text fingerprint seen > 1×, the q17/q60 exact-dup
    * rule). A filter threshold is only defensible if this curve is
    * monotone-ish — this query is the evidence either way, the same
    * audit q147 runs for MinHash banding. Integer end to end
    * ([[Dedup.QualU3Expr]] shared with q156, single-copy rule).
    *
    * Scale shape: one corpus scan; the only shuffle is the fingerprint
    * window (co-partitioned count per fp — the q60 shape); the result
    * lands on the fixed 11-bin domain.
    */
  def q232(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val w = Window.partitionBy(col("fp"))
    Dedup.withQualU3(docs)
      .withColumn("fp", md5(col("text")))
      .withColumn("n_fp", count(lit(1)).over(w))
      .withColumn("qbin", expr("q_u3 div 100"))
      .groupBy(col("qbin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_fp") > 1, 1L).otherwise(0L)).as("n_dups"))
      .withColumn("dup_permille", expr("(1000 * n_dups) div n_docs"))
      .orderBy(col("qbin"))
  }

  val q232Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH docsq AS (
       |  SELECT doc_id, text, $qualSql AS q_u3
       |  FROM (
       |    SELECT doc_id, text, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |d AS (
       |  SELECT q_u3 // 100 AS qbin,
       |         count(*) OVER (PARTITION BY md5(text)) AS n_fp
       |  FROM docsq)
       |SELECT qbin, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dups,
       |       (1000 * CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END)
       |                    AS BIGINT)) // count(*) AS dup_permille
       |FROM d GROUP BY qbin ORDER BY qbin""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_semantic_decontam" -> (q228 _),
    "q229_train_order" -> (q229 _),
    "q230_spearman_signals" -> (q230 _),
    "q231_langid_kappa" -> (q231 _),
    "q232_quality_dup_curve" -> (q232 _))

  val oracles: Map[String, String] = Map(
    "q228_semantic_decontam" -> q228Oracle,
    "q229_train_order" -> q229Oracle,
    "q230_spearman_signals" -> q230Oracle,
    "q231_langid_kappa" -> q231Oracle,
    "q232_quality_dup_curve" -> q232Oracle)
}
