package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CrossHash, WordShingles60}

/** The rare-shingle pipeline shared by q123 (syndication edges) and
  * q127 (containment): per-doc-distinct 5-token shingles hashed to
  * 8-byte keys by the native [[graft.functions.WordShingles60]] BEFORE
  * any shuffle, then a document-frequency cap expressed as a window
  * count riding the one shuffle-on-h the downstream self-join needs.
  * One definition (Scala + the oracle's CTE prefix) so the df-cap
  * semantics and threshold cannot drift between the two queries.
  */
object Shingles {

  /** Shingles occurring in more than this many documents are
    * boilerplate (headers, license text) and are dropped BEFORE any
    * pair self-join — the skew guard that keeps those joins linear in
    * real corpora.
    */
  val MaxDf: Int = 64

  /** (doc_id [, extra...], h, df) rows: every per-doc-distinct shingle
    * hash annotated with its document frequency — the df rides the one
    * shuffle-on-h every consumer needs anyway (window count, no
    * groupBy+join-back second corpus pass). Callers cap ([[rareHashes]])
    * or classify (q142's uniqueness score) on the annotated frame.
    */
  def hashesWithDf(docs: DataFrame, extra: Seq[String] = Nil): DataFrame = {
    val cols: Seq[Column] =
      (col("doc_id") +: extra.map(col)) :+ explode(array_distinct(
        WordShingles60.wordShingles60(col("toks"), 5))).as("h")
    docs
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .filter(size(col("toks")) >= 5)
      .select(cols: _*)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
  }

  /** (doc_id [, extra...], h) rows of rare shingle hashes. */
  def rareHashes(docs: DataFrame, extra: Seq[String] = Nil): DataFrame =
    hashesWithDf(docs, extra)
      .filter(col("df") <= MaxDf)
      .drop(col("df"))

  /** The oracle twin's CTE prefix for the UNCAPPED per-doc-distinct
    * shingle-hash set: `toks`, `sh`, `hs` (doc_id, hh, distinct per
    * doc — the twin of [[hashesWithDf]]'s exploded `array_distinct`,
    * which dedups HASHES, so a within-doc hash collision cannot skew
    * one engine only). Consumers that need the df cap use
    * [[rareCteSql]]; q173's exact similarity join uses this directly.
    */
  val hashesCteSql: String = {
    val h = CrossHash.h60Sql("shingle")
    s"""toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t WHERE tok <> ''),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id,
       |           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
       |           || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS shingle
       |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) s
       |  WHERE shingle IS NOT NULL),
       |hs AS MATERIALIZED (SELECT DISTINCT doc_id, $h AS hh FROM sh)"""
      .stripMargin
  }

  /** The oracle twin's CTE prefix: `toks`, `sh`, `hs` (doc_id, hh),
    * `rare` (the df-capped hash set). Callers append their own `ds`
    * join and everything downstream.
    */
  val rareCteSql: String =
    // concatenated, NOT interpolated into a stripMargin block — the
    // embedded `|| ' ' ||` concat lines would lose a pipe to a second
    // margin strip
    // hs/rare/pairs consumers reference these CTEs once per pagerank/
    // HITS/BFS iteration — MATERIALIZED stops DuckDB inlining the
    // whole shingle self-join into every iteration (the sf1 gate's
    // 70-CPU-minute q123 hang)
    hashesCteSql +
      s",\nrare AS MATERIALIZED (SELECT hh FROM hs GROUP BY hh HAVING count(*) <= $MaxDf)"
}
