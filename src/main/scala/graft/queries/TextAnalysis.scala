package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}
import graft.functions.CrossHash.h60Sql

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2.3 E4):
  * token statistics (q18), language-ID by marker scoring (q25), quality
  * scoring (q26), whitespace + BPE-ish token counting (q27), and k-gram
  * document fingerprinting (q28).
  *
  * Everything is built-in expressions / HOFs — per-document narrow maps
  * with at most one small aggregate shuffle, so each operator is a linear
  * scan at 100 TB.
  */
object TextAnalysis {

  // ---------------------------------------------------------------- q18

  /** Top-5 tokens per language. The heavy groupBy(lang, token) gets
    * map-side partial aggregation; the window only sees the collapsed
    * (lang, token) counts, not the exploded stream.
    */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("lang"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("token"))
    val counts = toks.groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("token"))
    counts
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("rn"), col("token"), col("cnt"))
      .orderBy(col("lang"), col("rn"))
  }

  val q18Oracle: String =
    """WITH toks AS (
      |  SELECT lang, tok AS token FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) t
      |  WHERE tok <> ''),
      |counts AS (
      |  SELECT lang, token, count(*) AS cnt FROM toks GROUP BY lang, token),
      |ranked AS (
      |  SELECT lang, token, cnt,
      |         row_number() OVER (PARTITION BY lang
      |                            ORDER BY cnt DESC, token) AS rn
      |  FROM counts)
      |SELECT lang, rn, token, cnt FROM ranked
      |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin

  // ---------------------------------------------------------------- q25

  /** Marker-word language ID: score each doc against per-language marker
    * lexicons, argmax with a fixed tie-break order, then emit the
    * lang × predicted confusion matrix. (The driver's synthetic corpus
    * shares one vocabulary across langs, so accuracy here is incidental —
    * the operator itself is what the oracle verifies.)
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** The marker-langid scored frame — `(…, lang, predicted, margin)`
    * per doc, `margin` = top score − runner-up score (the classifier's
    * integer confidence proxy). One definition for q25's confusion
    * matrix, q231's chance-corrected agreement and q240's reliability
    * curve so the classifier cannot fork.
    */
  private[queries] def langidPredicted(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
    val scored = markers.foldLeft(docs) { case (df, (lang, ms)) =>
      val inList = ms.map(m => s"'${m}'").mkString(", ")
      df.withColumn(s"s_$lang",
        expr(s"size(filter(toks, t -> t IN ($inList)))").cast("long"))
    }
    val predicted = markers.map(_._1).foldRight(lit("und"): org.apache.spark.sql.Column) {
      case (lang, elseCol) =>
        val geAll = markers.map(_._1).filter(_ != lang)
          .map(o => col(s"s_$lang") >= col(s"s_$o"))
          .reduce(_ && _) && col(s"s_$lang") > 0
        when(geAll, lit(lang)).otherwise(elseCol)
    }
    val scoreArr = markers.map(l => s"s_${l._1}").mkString(", ")
    scored
      .withColumn("predicted", predicted)
      .withColumn("sorted_s", expr(s"sort_array(array($scoreArr), false)"))
      .withColumn("margin",
        expr("element_at(sorted_s, 1) - element_at(sorted_s, 2)"))
      .drop("sorted_s")
  }

  def q25(spark: SparkSession, dir: String): DataFrame =
    langidPredicted(spark, dir)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))

  /** DuckDB twin of [[langidPredicted]] as a `scored → pred(lang,
    * predicted, margin)` CTE chain — shared verbatim by the q25, q231
    * and q240 oracles (single-copy rule).
    */
  private[queries] val langidPredCtes: String = {
    val scoreSelects = markers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'${m}'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS s_$lang"
    }.mkString(",\n         ")
    val caseChain = markers.map(_._1).map { lang =>
      val conds = (markers.map(_._1).filter(_ != lang)
        .map(o => s"s_$lang >= s_$o") :+ s"s_$lang > 0").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.mkString("\n                ")
    val scoreArr = markers.map(l => s"s_${l._1}").mkString(", ")
    s"""scored AS (
       |  SELECT doc_id, lang,
       |         $scoreSelects
       |  FROM documents),
       |pred AS (
       |  SELECT lang,
       |         CASE $caseChain
       |              ELSE 'und' END AS predicted,
       |         list_reverse_sort([$scoreArr])[1]
       |           - list_reverse_sort([$scoreArr])[2] AS margin
       |  FROM scored)""".stripMargin
  }

  val q25Oracle: String =
    s"""WITH $langidPredCtes
       |SELECT lang, predicted, count(*) AS n_docs
       |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin

  // ---------------------------------------------------------------- q26

  /** Per-document quality features + a composite score: token count,
    * mean token length, stopword ratio, alphabetic-character ratio.
    * Pure narrow projection — no shuffle at all.
    */
  def q26(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("alpha_chars",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
      .withColumn("stop_tokens",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in')))")
          .cast("long"))
      .withColumn("avg_token_len",
        length(regexp_replace(col("text"), " ", "")).cast("double") /
          col("n_tokens"))
      .withColumn("stop_ratio",
        col("stop_tokens").cast("double") / col("n_tokens"))
      .withColumn("alpha_ratio",
        col("alpha_chars").cast("double") / length(col("text")))
      .withColumn("quality",
        least(col("n_tokens").cast("double") / 50.0, lit(1.0)) * 0.4 +
          (lit(1.0) - col("stop_ratio")) * 0.3 + col("alpha_ratio") * 0.3)
      .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
        col("stop_ratio"), col("alpha_ratio"), col("quality"))
      .orderBy(col("doc_id"))

  val q26Oracle: String =
    """WITH f AS (
      |  SELECT doc_id,
      |         len(list_filter(string_split(text, ' '), t -> t <> ''))
      |           AS n_tokens,
      |         length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars,
      |         len(list_filter(string_split(text, ' '),
      |             t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS stop_tokens,
      |         length(replace(text, ' ', '')) AS nospace_chars,
      |         length(text) AS n_chars
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(n_tokens AS BIGINT) AS n_tokens,
      |       CAST(nospace_chars AS DOUBLE) / n_tokens AS avg_token_len,
      |       CAST(stop_tokens AS DOUBLE) / n_tokens AS stop_ratio,
      |       CAST(alpha_chars AS DOUBLE) / n_chars AS alpha_ratio,
      |       least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4 +
      |         (1.0 - CAST(stop_tokens AS DOUBLE) / n_tokens) * 0.3 +
      |         (CAST(alpha_chars AS DOUBLE) / n_chars) * 0.3 AS quality
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q27

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * lexer (`[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]` — letters runs, single
    * digits, single punctuation), plus a chars-per-token rate.
    */
  def q27(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").cast("long")
          .as("n_ws_tokens"),
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0))")
          .cast("long").as("n_bpe_tokens"),
        (length(col("text")).cast("double") /
          expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0))"))
          .as("chars_per_token"))
      .orderBy(col("doc_id"))

  val q27Oracle: String =
    """SELECT doc_id,
      |       CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
      |            AS BIGINT) AS n_ws_tokens,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
      |            AS BIGINT) AS n_bpe_tokens,
      |       CAST(length(text) AS DOUBLE) /
      |         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
      |         AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q28

  /** Rolling 8-gram fingerprint: minimum 60-bit content hash over all
    * 8-char windows of the first 200 chars (Rabin/winnowing-style
    * min-fingerprint). Zero shuffle; docs sharing a fingerprint are
    * near-dup candidates. Computed by the native codegen'd
    * [[graft.functions.MinGramHash]] expression (one pass, reused digest,
    * no hex round-trip) — bit-identical to the nested-HOF formulation it
    * replaced, and to the unchanged DuckDB oracle.
    */
  def q28(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .filter(length(col("text")) >= 8) // matched by the oracle's WHERE
      .withColumn("fingerprint",
        graft.functions.MinGramHash.minGramHash(col("text"), 8, 200))
      .select(col("doc_id"), col("fingerprint"))
      .orderBy(col("doc_id"))

  val q28Oracle: String =
    s"""WITH grams AS (
       |  SELECT doc_id, substr(text, CAST(r.range AS INT), 8) AS g
       |  FROM documents, range(1, 194) r
       |  WHERE length(text) >= 8
       |    AND r.range <= least(length(text), 200) - 7)
       |SELECT doc_id, min(${h60Sql("g")}) AS fingerprint
       |FROM grams GROUP BY doc_id ORDER BY doc_id""".stripMargin


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

  // ---------------------------------------------------------------- q111

  /** Keyword-in-context (KWIC) span extraction: for every occurrence of
    * [[KwicNeedle]] (first [[KwicPerDoc]] per document), emit the
    * 0-based token position and a ±[[KwicCtx]]-token context window —
    * the audit view a curation team pulls before shipping a filter or
    * redaction rule. Spans, not whole documents: the output is what a
    * reviewer reads.
    *
    * Scale shape: posexplode is a narrow generate; the needle filter
    * prunes to matching tokens BEFORE any shuffle; the per-doc cap is a
    * literal row_number bound (WindowGroupLimit); context slicing is a
    * pure projection on the already-carried token array.
    */
  val KwicNeedle = "data"
  val KwicCtx = 3
  val KwicPerDoc = 2

  def q111(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .filter(col("tok") === KwicNeedle)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("rk") <= KwicPerDoc)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        array_join(expr(
          s"slice(toks, greatest(1, pos + 1 - $KwicCtx), " +
            s"least(size(toks), pos + 1 + $KwicCtx) - greatest(1, pos + 1 - $KwicCtx) + 1)"),
          " ").as("context"))
      .orderBy(col("doc_id"), col("pos"))

  val q111Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, toks,
       |         unnest(toks) AS tok,
       |         generate_subscripts(toks, 1) AS pos1
       |  FROM t),
       |hits AS (
       |  SELECT doc_id, toks, pos1,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY pos1) AS rk
       |  FROM p WHERE tok = '$KwicNeedle')
       |SELECT doc_id, CAST(pos1 - 1 AS BIGINT) AS pos,
       |       array_to_string(
       |         list_slice(toks, greatest(1, pos1 - $KwicCtx),
       |                    least(len(toks), pos1 + $KwicCtx)), ' ') AS context
       |FROM hits WHERE rk <= $KwicPerDoc ORDER BY doc_id, pos""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_text_tokens" -> (q18 _),
    "q25_langid_markers" -> (q25 _),
    "q26_quality_score" -> (q26 _),
    "q27_token_count" -> (q27 _),
    "q28_fingerprint" -> (q28 _),
    "q172_gopher_rules" -> (q172 _),
    "q72_repetition_ratio" -> (q72 _),
    "q73_pii_redact" -> (q73 _),
    "q111_kwic_spans" -> (q111 _))

  val oracles: Map[String, String] = Map(
    "q18_text_tokens" -> q18Oracle,
    "q25_langid_markers" -> q25Oracle,
    "q26_quality_score" -> q26Oracle,
    "q27_token_count" -> q27Oracle,
    "q28_fingerprint" -> q28Oracle,
    "q172_gopher_rules" -> q172Oracle,
    "q72_repetition_ratio" -> q72Oracle,
    "q73_pii_redact" -> q73Oracle,
    "q111_kwic_spans" -> q111Oracle)
}
