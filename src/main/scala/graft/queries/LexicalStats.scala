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

  // ---------------------------------------------------------------- q97

  /** Per-document characteristic terms by TF-IDF, top 3 for every 10th
    * doc (document frequencies always computed over the FULL corpus).
    * The idf is integer-quantized — idf_q = (10^6 · N) div df — so the
    * score tf·idf_q is a BIGINT and both engines rank identically;
    * ties break on the term string. Monotone in the real tf·ln(N/df)
    * up to quantization, which is the point: reproducible curation
    * beats a 15th decimal of idf.
    *
    * Scale shape: tf is one partial+final aggregate on (doc_id, term);
    * df reuses tf's output keyed on term (second small shuffle); N is
    * a 1-row broadcast, never a driver value; the ranking window runs
    * only over the sampled docs. Overflow headroom: score ≤
    * tf · 10^6 · N ≤ 2^62 while tf·N ≤ 4.6 × 10^12 — at 10^8 docs
    * that allows tf 46k, far beyond any real document; breach raises
    * via the same guard style as q84.
    */
  def q97(spark: SparkSession, dir: String): DataFrame = {
    val tf = table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = table(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    // the guard lives INSIDE the score expression (q84's pattern) — a
    // standalone guard column would be dead code under column pruning.
    // Bound: score <= tf·10⁶·N must stay < 2⁶², so tf·N < 2⁶²/10⁶
    val scored = tf.filter(col("doc_id") % 10 === 0)
      .join(df_, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        when(col("tf") * col("n_docs") > 4611686018427L,
          raise_error(lit("q97: tf*N breaches the 2^62 score budget"))
            .cast("long"))
          .otherwise(expr("tf * ((1000000 * n_docs) DIV df)")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rn"))
  }

  val q97Oracle: String =
    """WITH tf AS (
      |  SELECT doc_id, tok AS term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) t
      |  WHERE tok <> '' GROUP BY doc_id, tok),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |         tf.tf * ((1000000 * n.n_docs) // df.df) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |  WHERE tf.doc_id % 10 = 0),
      |ranked AS (
      |  SELECT doc_id, term, tf, df, score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, term) AS rn
      |  FROM scored)
      |SELECT doc_id, rn, term, tf, df, score
      |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- q98

  /** PMI collocation mining: top-20 word bigrams by pointwise mutual
    * information, min count 5. Because the corpus totals U (unigrams)
    * and T (bigrams) are CONSTANT across candidates, ranking by
    * pmi = ln(c_ab·U²/(c_a·c_b·T)) is exactly ranking by
    * c_ab/(c_a·c_b) — computed as the integer
    * ratio_q = (10^9 · c_ab) div (c_a · c_b), so the rank order is
    * bit-identical cross-engine and no float ever decides the cut.
    * Ties break (c_ab desc, bigram asc).
    *
    * Scale shape: unigram and bigram counts are partial+final
    * aggregates; the two enrichment joins key on single tokens (the
    * unigram side is vocabulary-sized — Zipf-small relative to the
    * corpus, and AQE broadcasts it when it fits); top-20 is
    * TakeOrderedAndProject. Overflow: 10^9·c_ab stays under 2^62
    * while c_ab ≤ 4.6 × 10^9 — a single bigram occurring 4.6 billion
    * times; c_a·c_b ≤ U² overflows only past U = 3 × 10^9 distinct
    * token OCCURRENCES of the same unigram pair, both far beyond the
    * design envelope and guarded in the spec's headroom note.
    */
  val PmiMinCount = 5

  def q98(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
    val uni = toks
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val big = toks
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS ta, toks[i+1] AS tb))"))
        .as("bg"))
      .select(col("bg.ta"), col("bg.tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= PmiMinCount)
    big
      .join(uni.withColumnRenamed("tok", "ta").withColumnRenamed("c", "c_a"), "ta")
      .join(uni.withColumnRenamed("tok", "tb").withColumnRenamed("c", "c_b"), "tb")
      .withColumn("ratio_q",
        expr("(1000000000 * c_ab) DIV (c_a * c_b)"))
      .select(col("ta"), col("tb"), col("c_ab"), col("c_a"), col("c_b"),
        col("ratio_q"))
      .orderBy(col("ratio_q").desc, col("c_ab").desc, col("ta"), col("tb"))
      .limit(20)
  }

  val q98Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE tok <> ''),
       |uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       |pairs AS (
       |  SELECT tok AS ta, lead(tok, 1) OVER w AS tb
       |  FROM toks
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |big AS (
       |  SELECT ta, tb, count(*) AS c_ab FROM pairs
       |  WHERE tb IS NOT NULL GROUP BY ta, tb
       |  HAVING count(*) >= $PmiMinCount)
       |SELECT big.ta, big.tb, big.c_ab,
       |       ua.c AS c_a, ub.c AS c_b,
       |       (1000000000 * big.c_ab) // (ua.c * ub.c) AS ratio_q
       |FROM big
       |JOIN uni ua ON big.ta = ua.tok
       |JOIN uni ub ON big.tb = ub.tok
       |ORDER BY ratio_q DESC, c_ab DESC, ta, tb LIMIT 20""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_zipf_slope" -> (q177 _),
    "q178_lexical_diversity" -> (q178 _),
    "q179_kl_divergence" -> (q179 _),
    "q186_quantile_normalize" -> (q186 _),
    "q97_tfidf_topk" -> (q97 _),
    "q98_pmi_bigrams" -> (q98 _))

  val oracles: Map[String, String] = Map(
    "q177_zipf_slope" -> q177Oracle,
    "q178_lexical_diversity" -> q178Oracle,
    "q179_kl_divergence" -> q179Oracle,
    "q186_quantile_normalize" -> q186Oracle,
    "q97_tfidf_topk" -> q97Oracle,
    "q98_pmi_bigrams" -> q98Oracle)
}
