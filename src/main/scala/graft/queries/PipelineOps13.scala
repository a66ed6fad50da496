package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q172: the full Gopher-style quality-rule battery (Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from Training
  * Gopher", arXiv:2112.11446, Table A1) as one corpus pass.
  *
  * q164 already profiles the REPETITION rules; this is the document-
  * shape battery: word count bounds, mean-word-length bounds, minimum
  * stopword evidence, and a type-token-ratio floor. Each document gets
  * a fail bitmask; the per-language rollup reports how much of the
  * corpus each rule removes and what survives the whole battery — the
  * "what did my filter do" audit every curation run starts from.
  *
  * Bounds are calibrated to the synthetic corpus (words 10-99, mean
  * word length 3.7-5.3 chars) so every rule genuinely discriminates;
  * production Gopher bounds are 50-100k words and [3,10] chars.
  * Integer-only throughout: mean word length and TTR are permilles via
  * DIV, so the verdicts are bit-identical cross-engine.
  *
  * Scale shape: a narrow zero-shuffle projection per document; the
  * only exchange is the 5-row language rollup's partial aggregates.
  * At 100 TB this is the ideal operator — one scan, map-side combine,
  * bytes on the wire proportional to languages, not documents.
  */
object PipelineOps13 {

  /** Rule bounds (inclusive) and bit values in the fail mask. */
  val WcMin = 30L;  val WcMax = 90L    // bit 1: word count
  val MwlMin = 3500L; val MwlMax = 5000L // bit 2: mean word len, permille
  val StopMin = 2L                      // bit 4: stopword count
  val TtrMin = 500L                     // bit 8: distinct-token permille

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  // ---------------------------------------------------------------- q172

  /** q172: per-language Gopher-battery rollup — docs, per-rule failure
    * counts, docs passing ALL rules, and the survivor permille.
    */
  def q172(spark: SparkSession, dir: String): DataFrame = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    table(spark, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("w", size(col("toks")).cast("long"))
      .withColumn("mwl",
        expr("CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000 DIV w"))
      .withColumn("stop",
        expr(s"size(filter(toks, t -> t IN ($stopList)))").cast("long"))
      .withColumn("ttr",
        expr("CAST(size(array_distinct(toks)) AS BIGINT) * 1000 DIV w"))
      .withColumn("f_wc",
        when(col("w").between(WcMin, WcMax), 0L).otherwise(1L))
      .withColumn("f_mwl",
        when(col("mwl").between(MwlMin, MwlMax), 0L).otherwise(1L))
      .withColumn("f_stop", when(col("stop") >= StopMin, 0L).otherwise(1L))
      .withColumn("f_ttr", when(col("ttr") >= TtrMin, 0L).otherwise(1L))
      .withColumn("passed",
        when(col("f_wc") + col("f_mwl") + col("f_stop") + col("f_ttr") === 0L,
          1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("f_wc")).as("fail_wordcount"),
        sum(col("f_mwl")).as("fail_meanwordlen"),
        sum(col("f_stop")).as("fail_stopwords"),
        sum(col("f_ttr")).as("fail_ttr"),
        sum(col("passed")).as("n_pass"))
      .withColumn("pass_permille", expr("n_pass * 1000 DIV n_docs"))
      .select(col("lang"), col("n_docs"), col("fail_wordcount"),
        col("fail_meanwordlen"), col("fail_stopwords"), col("fail_ttr"),
        col("n_pass"), col("pass_permille"))
      .orderBy(col("lang"))
  }

  val q172Oracle: String = {
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH f AS (
       |  SELECT lang,
       |         list_filter(string_split(text, ' '), t -> t <> '') AS toks,
       |         length(replace(text, ' ', '')) AS nosp
       |  FROM documents),
       |g AS (
       |  SELECT lang, len(toks) AS w,
       |         CAST(nosp AS BIGINT) * 1000 // len(toks) AS mwl,
       |         len(list_filter(toks, t -> t IN ($stopList))) AS stop,
       |         CAST(len(list_distinct(toks)) AS BIGINT) * 1000 // len(toks)
       |           AS ttr
       |  FROM f),
       |v AS (
       |  SELECT lang,
       |         CASE WHEN w BETWEEN $WcMin AND $WcMax THEN 0 ELSE 1 END AS f_wc,
       |         CASE WHEN mwl BETWEEN $MwlMin AND $MwlMax THEN 0 ELSE 1 END
       |           AS f_mwl,
       |         CASE WHEN stop >= $StopMin THEN 0 ELSE 1 END AS f_stop,
       |         CASE WHEN ttr >= $TtrMin THEN 0 ELSE 1 END AS f_ttr
       |  FROM g)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(f_wc) AS BIGINT) AS fail_wordcount,
       |       CAST(sum(f_mwl) AS BIGINT) AS fail_meanwordlen,
       |       CAST(sum(f_stop) AS BIGINT) AS fail_stopwords,
       |       CAST(sum(f_ttr) AS BIGINT) AS fail_ttr,
       |       CAST(sum(CASE WHEN f_wc + f_mwl + f_stop + f_ttr = 0
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |       CAST(sum(CASE WHEN f_wc + f_mwl + f_stop + f_ttr = 0
       |                     THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
       |         AS pass_permille
       |FROM v GROUP BY lang ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q172_gopher_rules" -> (q172 _))

  val oracles: Map[String, String] = Map(
    "q172_gopher_rules" -> q172Oracle)
}
