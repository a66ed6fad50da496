package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q175-q176: corpus-concentration diagnostics over per-language token
  * frequencies — the "is my training mix dominated by a handful of
  * types" audit run before fixing a sampling temperature (q165) or a
  * domain quota (q102).
  *
  *  - q175 Simpson/Herfindahl concentration: λ = Σ nᵢ(nᵢ−1) / (N(N−1)),
  *    the exact probability two tokens drawn without replacement are
  *    the same type (Simpson 1949, "Measurement of diversity"; the
  *    unbiased estimator). Pure integer rational → permille via DIV.
  *  - q176 Gini coefficient of the frequency distribution:
  *    G = (2·Σ i·x₍ᵢ₎ − (n+1)·T) / (n·T) over ascending-ranked
  *    frequencies — the standard discrete (Lorenz) form. Integer-exact
  *    in permille; 0 for a uniform vocabulary.
  *
  * Both ride ONE (lang, tok) frequency frame: the corpus-scale work is
  * a single tokenize+groupBy pass; everything after operates on the
  * VOCABULARY (types, not tokens), which is sublinear in corpus size.
  * q176's rank window partitions by lang over that vocab frame — the
  * bounded-domain window argument of q168/q174, never a corpus-sized
  * partition. Overflow bound: N(N−1) and n·T stay inside int64 while
  * N < 3·10⁹ tokens per language; past that, the same sums sharded by
  * token-hash ranges still compose exactly (Σ nᵢ(nᵢ−1) is associative)
  * — only the final ratio is taken once.
  */
object CorpusStats {

  /** (lang, tok, n): per-language token frequencies — shared
    * constructor so q175 and q176 cannot drift on tokenization.
    */
  private[queries] def tokenFreq(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("lang"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"))

  private[queries] val TfCte: String =
    """tf AS (
      |  SELECT lang, tok, count(*) AS n FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) t
      |  WHERE tok <> '' GROUP BY lang, tok)""".stripMargin

  // ---------------------------------------------------------------- q175

  /** q175: per-language Simpson concentration + the top-type share. */
  def q175(spark: SparkSession, dir: String): DataFrame =
    tokenFreq(spark, dir)
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("n") * (col("n") - 1L)).as("coll"),
        max(col("n")).as("top_n"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        expr("1000 * coll DIV (n_tokens * (n_tokens - 1))")
          .as("lambda_permille"),
        expr("1000 * top_n DIV n_tokens").as("top_share_permille"))
      .orderBy(col("lang"))

  val q175Oracle: String =
    s"""WITH $TfCte
       |SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens,
       |       CAST(count(*) AS BIGINT) AS n_types,
       |       CAST(1000 * sum(n * (n - 1)) // (sum(n) * (sum(n) - 1))
       |         AS BIGINT) AS lambda_permille,
       |       CAST(1000 * max(n) // sum(n) AS BIGINT) AS top_share_permille
       |FROM tf GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q176

  /** q176: per-language Gini coefficient of token frequencies, with the
    * ascending rank assigned by (n, tok) so ties are deterministic (the
    * coefficient itself is invariant to order within equal n).
    */
  def q176(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("n"), col("tok"))
    tokenFreq(spark, dir)
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("n")).as("n_tokens"),
        sum(col("i") * col("n")).as("s"))
      .select(col("lang"), col("n_types"), col("n_tokens"),
        expr("1000 * (2 * s - (n_types + 1) * n_tokens) DIV (n_types * n_tokens)")
          .as("gini_permille"))
      .orderBy(col("lang"))
  }

  val q176Oracle: String =
    s"""WITH $TfCte,
       |rk AS (
       |  SELECT lang, n,
       |         row_number() OVER (PARTITION BY lang ORDER BY n, tok) AS i
       |  FROM tf)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
       |       CAST(sum(n) AS BIGINT) AS n_tokens,
       |       CAST(1000 * (2 * sum(i * n) - (count(*) + 1) * sum(n))
       |            // (count(*) * sum(n)) AS BIGINT) AS gini_permille
       |FROM rk GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q168

  /** q168: exact length quantiles per language (P50/P90/P99 token
    * counts) WITHOUT sorting the corpus — the ordinal statistic is
    * recovered from a cumulative sum over the (lang, dl) COUNT table,
    * whose domain is |langs| × |distinct lengths| (thousands of rows at
    * any corpus size, because dl is a bounded integer). That is the
    * 100 TB design: one partial-aggregated pass builds the histogram,
    * the quantile walk runs on the tiny frame; a sort-based
    * `percentile_disc` over the corpus would instead pay a full
    * range-partitioned sort per language.
    *
    * percentile_disc semantics, integer-exact: P(p) = min dl whose
    * cumulative count reaches ceil(p·n), with ceil(a/b) spelled
    * `(a + b − 1) DIV b` in both engines.
    */
  def q168(spark: SparkSession, dir: String): DataFrame = {
    val hist = table(spark, dir, "documents")
      .select(col("lang"),
        expr("CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT)")
          .as("dl"))
      .filter(col("dl") > 0)
      .groupBy(col("lang"), col("dl")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("dl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("lang"))))
    def pick(num: Int, den: Int, name: String) =
      cum.filter(col("cum") >= expr(s"($num * n + $den - 1) DIV $den"))
        .groupBy(col("lang")).agg(min(col("dl")).as(name))
    pick(1, 2, "p50")
      .join(pick(9, 10, "p90"), "lang")
      .join(pick(99, 100, "p99"), "lang")
      .join(cum.groupBy(col("lang")).agg(max(col("n")).as("n_docs")), "lang")
      .select(col("lang"), col("n_docs"), col("p50"), col("p90"), col("p99"))
      .orderBy(col("lang"))
  }

  val q168Oracle: String =
    s"""WITH d AS (
       |  SELECT lang,
       |         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
       |           AS BIGINT) AS dl
       |  FROM documents),
       |h AS (
       |  SELECT lang, dl, count(*) AS c FROM d WHERE dl > 0
       |  GROUP BY lang, dl),
       |cum AS (
       |  SELECT lang, dl,
       |         CAST(sum(c) OVER (PARTITION BY lang ORDER BY dl
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |         CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n
       |  FROM h),
       |p50 AS (SELECT lang, min(dl) AS p50 FROM cum
       |        WHERE cum >= (1 * n + 1) // 2 GROUP BY lang),
       |p90 AS (SELECT lang, min(dl) AS p90 FROM cum
       |        WHERE cum >= (9 * n + 9) // 10 GROUP BY lang),
       |p99 AS (SELECT lang, min(dl) AS p99 FROM cum
       |        WHERE cum >= (99 * n + 99) // 100 GROUP BY lang),
       |nd AS (SELECT lang, max(n) AS n_docs FROM cum GROUP BY lang)
       |SELECT lang, n_docs, p50, p90, p99
       |FROM p50 JOIN p90 USING (lang) JOIN p99 USING (lang)
       |  JOIN nd USING (lang)
       |ORDER BY lang""".stripMargin

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
    "q175_simpson_concentration" -> (q175 _),
    "q176_token_gini" -> (q176 _),
    "q168_length_quantiles" -> (q168 _),
    "q88_ngram_topk" -> (q88 _),
    "q93_heavy_hitters" -> (q93 _))

  val oracles: Map[String, String] = Map(
    "q175_simpson_concentration" -> q175Oracle,
    "q176_token_gini" -> q176Oracle,
    "q168_length_quantiles" -> q168Oracle,
    "q88_ngram_topk" -> q88Oracle)
}
