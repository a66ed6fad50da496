package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q177-q179: lexical-distribution diagnostics a training-data curator
  * runs next to the concentration metrics of q175/q176 — "does this
  * corpus look like natural language, and does each source speak the
  * same language as the whole".
  *
  *  - q177 Zipf slope: fit ln(freq) ~ ln(rank) per language over the
  *    top-ranked vocabulary (Zipf 1949; natural text slopes ≈ −1).
  *    Rank windows partition by lang over the VOCABULARY frame
  *    (types, not tokens — the q175/q176 sublinearity argument), and
  *    the regression is a one-pass moment aggregate (`regr_slope`),
  *    never a driver-side fit.
  *  - q178 lexical diversity per document: type/token ratio and hapax
  *    (frequency-1 type) rate — the per-doc repetition screen used
  *    beside q72's repetition ratio. Pure integer permille.
  *  - q179 KL divergence of each source's unigram distribution from
  *    the corpus distribution: Σ p ln(p/q), the drift score used to
  *    catch a source whose token mix diverges from the pool before it
  *    is upsampled (cf. q165's temperature mixture). Rewritten as
  *    (Σ n_st·ln(n_st·N / (N_s·n_t))) / N_s so every input is an exact
  *    integer count; only the final ln/sum are floating.
  *
  * Scale shape: all three ride one tokenize+groupBy pass each (the
  * corpus-scale cost); q177/q179 then operate on vocabulary-sized
  * frames (≤ types×langs / types×sources rows — tiny at any corpus
  * size, since vocabulary grows ~O(corpus^0.5) by Heaps' law), and the
  * corpus-vocab side of q179's join is broadcast. q178 groups on
  * (doc_id, tok) — co-partitioned 8-byte-dominant keys, no window.
  */
object LexicalStats {

  // ---------------------------------------------------------------- q177

  /** q177: per-language Zipf slope/intercept over the top 100 types,
    * rank assigned by (n desc, tok) so ties are deterministic.
    */
  def q177(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n").desc, col("tok"))
    CorpusStats.tokenFreq(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 100)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranked"),
        round(expr("regr_slope(ln(n), ln(rank))"), 4).as("zipf_slope"),
        round(expr("regr_intercept(ln(n), ln(rank))"), 4)
          .as("zipf_intercept"),
        round(expr("regr_r2(ln(n), ln(rank))"), 4).as("zipf_r2"))
      .orderBy(col("lang"))
  }

  val q177Oracle: String =
    s"""WITH ${CorpusStats.TfCte},
       |rk AS (
       |  SELECT lang, n,
       |         row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok)
       |           AS rank
       |  FROM tf)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_ranked,
       |       round(regr_slope(ln(n), ln(rank)), 4) AS zipf_slope,
       |       round(regr_intercept(ln(n), ln(rank)), 4) AS zipf_intercept,
       |       round(regr_r2(ln(n), ln(rank)), 4) AS zipf_r2
       |FROM rk WHERE rank <= 100
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q178

  /** q178: per-document type/token ratio and hapax rate (permille). */
  def q178(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        expr("1000 * n_types DIV n_tokens").as("ttr_permille"),
        expr("1000 * n_hapax DIV n_tokens").as("hapax_permille"))
      .orderBy(col("doc_id"))

  val q178Oracle: String =
    """WITH dtf AS (
      |  SELECT doc_id, tok, count(*) AS n FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) t
      |  WHERE tok <> '' GROUP BY doc_id, tok)
      |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
      |       CAST(count(*) AS BIGINT) AS n_types,
      |       CAST(1000 * count(*) // sum(n) AS BIGINT) AS ttr_permille,
      |       CAST(1000 * sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) // sum(n)
      |         AS BIGINT) AS hapax_permille
      |FROM dtf GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q179

  /** q179: KL(source ‖ corpus) over unigrams, in nats. The corpus
    * (tok → n_t, N) side is vocabulary-sized → broadcast; the double
    * work is one ln per (source, type) pair.
    */
  def q179(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
    val bySrc = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n_st"))
    val srcTotal = bySrc.groupBy(col("source"))
      .agg(sum(col("n_st")).as("n_source"))
    val corpus = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_t"))
    val total = corpus.agg(sum(col("n_t")).as("n_total"))
    bySrc.join(broadcast(corpus), "tok")
      .join(broadcast(srcTotal), "source")
      .crossJoin(broadcast(total))
      .groupBy(col("source"), col("n_source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("n_st") *
          log(col("n_st") * col("n_total") /
            (col("n_source") * col("n_t")))).as("kl_num"))
      .select(col("source"), col("n_source"), col("n_types"),
        round(col("kl_num") / col("n_source"), 6).as("kl_nats"))
      .orderBy(col("source"))
  }

  val q179Oracle: String =
    """WITH toks AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |s AS (SELECT source, tok, count(*) AS n_st FROM toks
      |      WHERE tok <> '' GROUP BY source, tok),
      |c AS (SELECT tok, count(*) AS n_t FROM toks
      |      WHERE tok <> '' GROUP BY tok),
      |tot AS (SELECT sum(n_t) AS n_total FROM c),
      |src AS (SELECT source, sum(n_st) AS n_source FROM s GROUP BY source)
      |SELECT s.source, CAST(src.n_source AS BIGINT) AS n_source,
      |       CAST(count(*) AS BIGINT) AS n_types,
      |       round(sum(s.n_st * ln(s.n_st * tot.n_total /
      |             (src.n_source * c.n_t))) / src.n_source, 6) AS kl_nats
      |FROM s JOIN c USING (tok) JOIN src USING (source) CROSS JOIN tot
      |GROUP BY s.source, src.n_source ORDER BY s.source""".stripMargin

  // ---------------------------------------------------------------- q186

  /** q186: per-source quantile normalization of document length — each
    * doc's length is mapped to its source-relative rank permille
    * (1000·(rank−1)/(n−1), the exact percent_rank as an integer), then
    * bucketed into deciles and counted. A calibrated source shows ~n/10
    * docs per decile; the cross-source histogram is how mixed-source
    * quality thresholds (q26) are made comparable before a global
    * cutoff is applied. One window pass partitioned by source; the
    * histogram frame is sources×10 rows. Singleton sources pin to
    * decile 0 (n−1 guarded to 1).
    */
  def q186(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    table(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy(col("source"))))
      .select(col("source"),
        least(lit(9L), expr("(1000 * (rn - 1) DIV greatest(n - 1, 1))" +
          " DIV 100")).as("decile"))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("decile"))
  }

  val q186Oracle: String =
    """WITH r AS (
      |  SELECT source,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY n_chars, doc_id) AS rn,
      |         count(*) OVER (PARTITION BY source) AS n
      |  FROM documents)
      |SELECT source,
      |       least(9, (1000 * (rn - 1) // greatest(n - 1, 1)) // 100)
      |         AS decile,
      |       CAST(count(*) AS BIGINT) AS n_docs
      |FROM r GROUP BY source, decile ORDER BY source, decile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_zipf_slope" -> (q177 _),
    "q178_lexical_diversity" -> (q178 _),
    "q179_kl_divergence" -> (q179 _),
    "q186_quantile_normalize" -> (q186 _))

  val oracles: Map[String, String] = Map(
    "q177_zipf_slope" -> q177Oracle,
    "q178_lexical_diversity" -> q178Oracle,
    "q179_kl_divergence" -> q179Oracle,
    "q186_quantile_normalize" -> q186Oracle)
}
