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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q175_simpson_concentration" -> (q175 _),
    "q176_token_gini" -> (q176 _))

  val oracles: Map[String, String] = Map(
    "q175_simpson_concentration" -> q175Oracle,
    "q176_token_gini" -> q176Oracle)
}
