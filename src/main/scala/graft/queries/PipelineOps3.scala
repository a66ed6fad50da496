package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}

/** q72-q73: data-quality operators for training-data curation —
  * repetition detection (duplicate-bigram ratio) and PII redaction.
  */
object PipelineOps3 {

  // ---------------------------------------------------------------- q72

  /** Repetition ratio: the fraction of word bigrams that are duplicates
    * (1 − distinct/total) — the standard "excessive repetition" quality
    * gate for web-scraped corpora. Pure narrow projection (HOF bigrams +
    * exact int counts; the ratio is one int/int division, bit-equal
    * cross-engine), flagging docs above a fixed threshold.
    */
  def q72(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("toks",
        expr("filter(split(lower(text), ' +'), t -> t <> '')"))
      .filter(size(col("toks")) >= 2)
      .withColumn("bigrams", expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))"))
      .select(
        col("doc_id"),
        size(col("bigrams")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bigrams"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct") / col("n_bigrams"))
      .withColumn("is_repetitive", col("rep_ratio") > 0.1)
      .orderBy(col("doc_id"))

  val q72Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), ' +'),
      |                     t -> t <> '') AS toks
      |  FROM documents),
      |b AS (
      |  SELECT doc_id,
      |         list_transform(range(1, len(toks)),
      |                        i -> toks[i] || ' ' || toks[i+1]) AS bigrams
      |  FROM t WHERE len(toks) >= 2)
      |SELECT doc_id,
      |       CAST(len(bigrams) AS BIGINT) AS n_bigrams,
      |       CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct,
      |       1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
      |         AS rep_ratio,
      |       (1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams))
      |         > 0.1 AS is_repetitive
      |FROM b ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q73

  /** PII redaction: seed each document with a deterministic synthetic
    * email + phone (the corpus has none), then scrub both with
    * regexp_replace and count what was caught. The scrub chain is a
    * narrow projection — at 100 TB this runs at scan speed, and the
    * md5 of the redacted form certifies the exact output text
    * cross-engine.
    */
  def q73(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "documents" -> "documents_v73")(
      """WITH aug AS (
        |  SELECT doc_id,
        |         concat(text, ' contact: user', CAST(doc_id AS STRING),
        |                '@example.com or +1-555-',
        |                lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))
        |           AS raw
        |  FROM documents_v73 WHERE doc_id % 3 = 0)
        |SELECT doc_id,
        |       CAST(size(regexp_extract_all(raw,
        |           '[A-Za-z0-9._]+@[A-Za-z0-9.]+', 0)) AS BIGINT) AS n_emails,
        |       CAST(size(regexp_extract_all(raw,
        |           '\\+[0-9][0-9-]{6,}', 0)) AS BIGINT) AS n_phones,
        |       md5(regexp_replace(regexp_replace(raw,
        |           '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>'),
        |           '\\+[0-9][0-9-]{6,}', '<PHONE>')) AS redacted_md5
        |FROM aug ORDER BY doc_id""".stripMargin)

  val q73Oracle: String =
    """WITH aug AS (
      |  SELECT doc_id,
      |         text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
      |         '@example.com or +1-555-' ||
      |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      |  FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(raw,
      |           '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(raw,
      |           '\+[0-9][0-9-]{6,}')) AS BIGINT) AS n_phones,
      |       md5(regexp_replace(regexp_replace(raw,
      |           '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
      |           '\+[0-9][0-9-]{6,}', '<PHONE>', 'g')) AS redacted_md5
      |FROM aug ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_repetition_ratio" -> (q72 _),
    "q73_pii_redact" -> (q73 _))

  val oracles: Map[String, String] = Map(
    "q72_repetition_ratio" -> q72Oracle,
    "q73_pii_redact" -> q73Oracle)
}
