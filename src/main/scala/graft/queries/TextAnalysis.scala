package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}
import graft.functions.CrossHash
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

  // ---------------------------------------------------------------- q217

  /** q217: FORCAST readability per language — the readability formula
    * built for text WITHOUT sentence structure (technical material;
    * Caylor & Sticht 1973), which is exactly this corpus's shape (no
    * sentence punctuation, so Flesch/Kincaid's words-per-sentence term
    * is undefined). Grade = 20 − N/10 where N = monosyllabic words per
    * 150-word sample; in integer milli-grades over a whole doc:
    * `20000 − (15000·mono) DIV words`. Syllables are vowel-group runs
    * (`[aeiouy]+`) — the standard dictionary-free approximation — so
    * the whole score is EXACT integer arithmetic over two counts and
    * the hash gate certifies the scoring itself, not a float proxy.
    *
    * Scale shape: one narrow pass (split → per-token vowel-run count
    * via regexp_extract_all, all inside whole-stage codegen), a per-doc
    * aggregate on the doc_id partitioning the explode already has, and
    * a final rollup landing on the language domain. Zero joins; at
    * 100 TB this runs at scan speed.
    */
  def q217(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), col("lang"),
        explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("lang"),
        size(expr("regexp_extract_all(tok, '[aeiouy]+', 0)"))
          .cast("long").as("sylls"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        count(lit(1)).as("words"),
        sum(col("sylls")).as("sylls"),
        sum(when(col("sylls") === 1L, 1L).otherwise(0L)).as("mono"))
      .withColumn("grade_milli",
        lit(20000L) - expr("(15000 * mono) DIV words"))
    perDoc
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("words")).as("n_words"),
        sum(col("sylls")).as("n_syllables"),
        sum(col("mono")).as("n_monosyllabic"),
        expr("(1000 * sum(mono)) DIV sum(words)").as("mono_permille"),
        expr("sum(grade_milli) DIV count(1)").as("avg_grade_milli"))
      .orderBy(col("lang"))
  }

  val q217Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      |  FROM documents),
      |sy AS (
      |  SELECT doc_id, lang,
      |         len(regexp_extract_all(tok, '[aeiouy]+')) AS sylls
      |  FROM toks),
      |perdoc AS (
      |  SELECT doc_id, lang,
      |         count(*) AS words,
      |         CAST(sum(sylls) AS BIGINT) AS sylls,
      |         CAST(sum(CASE WHEN sylls = 1 THEN 1 ELSE 0 END) AS BIGINT) AS mono
      |  FROM sy GROUP BY doc_id, lang),
      |graded AS (
      |  SELECT lang, words, sylls, mono,
      |         20000 - (15000 * mono) // words AS grade_milli
      |  FROM perdoc)
      |SELECT lang,
      |       count(*) AS n_docs,
      |       CAST(sum(words) AS BIGINT) AS n_words,
      |       CAST(sum(sylls) AS BIGINT) AS n_syllables,
      |       CAST(sum(mono) AS BIGINT) AS n_monosyllabic,
      |       CAST((1000 * sum(mono)) // sum(words) AS BIGINT) AS mono_permille,
      |       CAST(sum(grade_milli) // count(*) AS BIGINT) AS avg_grade_milli
      |FROM graded GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q223

  /** q223: integer-exact BIGRAM surprisal per language — the
    * conditional-perplexity quality signal (the CCNet recipe scores
    * docs with an n-gram LM; q167 is the unigram degenerate case, this
    * adds the Markov conditioning that separates "rare words" from
    * "rare SEQUENCES of common words" — scrambled/boilerplate text has
    * ordinary unigrams but surprising bigrams). A bigram instance's
    * surprisal is floor(log2 c(prev)) − floor(log2 c(prev,cur)) ≥ 0
    * via the bit-length identity (`length(bin(x)) − 1`, the q167/q219
    * trick), where both counts come from the corpus itself
    * (train = score, q167's self-scoring contract) — so every score is
    * a BIGINT no FP rounding can fork, and the hash gate certifies the
    * LM scoring itself.
    *
    * Scale shape: bigram instances are built INSIDE codegen (per-doc
    * array transform — no self-join, no positional shuffle); the
    * bigram count table rides one shuffle of the pair key; context
    * counts reduce from the bigram table (never a second corpus pass);
    * both join back under AQE. Per-doc and per-lang folds are keyed
    * aggregates landing on the language domain.
    */
  def q223(spark: SparkSession, dir: String): DataFrame = {
    // tokenization + pairing through the single LM copy (q244/streaming
    // share it); split is never read here, so don't pay its id-hash
    val bigr = EvalOps.bigramsOf(
      table(spark, dir, "documents"), withSplit = false)
    // OPTIMIZATION r16 (guide §2.4): bc is bounded by bigram TYPES
    // (vocab², never the corpus) and has three consumers (ctx, the
    // join-back, and ctx's join) — checkpointing it stops the ctx
    // branch replaying the whole tokenize+explode+aggregate chain
    // (plan: 3 documents scans -> 2).
    val bc = bigr.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("bcnt"))
      .localCheckpoint()
    val ctx = bc.groupBy(col("prev")).agg(sum(col("bcnt")).as("ccnt"))
    val perDoc = bigr
      .join(bc, Seq("prev", "cur"))
      .join(ctx, Seq("prev"))
      .select(col("doc_id"), col("lang"),
        (length(expr("bin(ccnt)")) - length(expr("bin(bcnt)")))
          .cast("long").as("surp"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("nb"), sum(col("surp")).as("ss"))
      .withColumn("doc_permille", expr("(1000 * ss) DIV nb"))
    perDoc.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("nb")).as("n_bigrams"),
        expr("(1000 * sum(ss)) DIV sum(nb)").as("corpus_surp_permille"),
        max(col("doc_permille")).as("max_doc_permille"))
      .orderBy(col("lang"))
  }

  val q223Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents),
      |bigr AS MATERIALIZED (
      |  SELECT doc_id, lang, toks[i] AS prev, toks[i + 1] AS cur
      |  FROM d, unnest(range(1, len(toks))) AS u(i)
      |  WHERE len(toks) >= 2),
      |bc AS MATERIALIZED (
      |  SELECT prev, cur, count(*) AS bcnt FROM bigr GROUP BY prev, cur),
      |ctx AS (
      |  SELECT prev, CAST(sum(bcnt) AS BIGINT) AS ccnt FROM bc GROUP BY prev),
      |perdoc AS (
      |  SELECT doc_id, lang, count(*) AS nb,
      |         CAST(sum(length(bin(ccnt)) - length(bin(bcnt))) AS BIGINT) AS ss
      |  FROM bigr JOIN bc USING (prev, cur) JOIN ctx USING (prev)
      |  GROUP BY doc_id, lang),
      |scored AS (
      |  SELECT lang, nb, ss, (1000 * ss) // nb AS doc_permille FROM perdoc)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(nb) AS BIGINT) AS n_bigrams,
      |       CAST((1000 * sum(ss)) // sum(nb) AS BIGINT)
      |         AS corpus_surp_permille,
      |       CAST(max(doc_permille) AS BIGINT) AS max_doc_permille
      |FROM scored GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q164

  /** Repetition flags: a doc is repetitive when more than
    * [[DupTokMax]]‰ of its tokens are repeats of an earlier token, or
    * more than [[DupBigramMax]]‰ of its bigrams repeat. Thresholds are
    * literals calibrated on the driver corpus (duplicate-token permille
    * centers near 490, duplicate-bigram near 30).
    */
  val DupTokMax = 600L
  val DupBigramMax = 80L

  /** q164: Gopher-style repetition quality profile. Per document, the
    * duplicate-token fraction `(dl − |distinct toks|)·1000 DIV dl` and
    * the duplicate-bigram fraction over the dl−1 adjacent pairs —
    * computed entirely with array HOFs on the `toks` array
    * (`array_distinct`, `transform(sequence(...))`), so the corpus pass
    * is NARROW: no explode, no (doc, token) shuffle, nothing leaves the
    * row until the per-language rollup aggregates five groups. That is
    * the 100 TB shape — a full-corpus quality scan whose only exchange
    * carries one row per language.
    *
    * Integer permilles throughout (floor semantics via DIV, zero-guard
    * on single-token docs); per-language averages are
    * truncated-quotient sums, bit-identical cross-engine.
    */
  def q164(spark: SparkSession, dir: String): DataFrame = {
    val prof = table(spark, dir, "documents")
      .select(col("lang"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .filter(col("dl") > 0)
      .withColumn("dup_tok",
        expr("(dl - size(array_distinct(toks))) * 1000 DIV dl"))
      .withColumn("bigrams",
        expr("CASE WHEN dl >= 2 THEN transform(sequence(1, dl - 1), " +
          "i -> concat(element_at(toks, CAST(i AS INT)), ' ', " +
          "element_at(toks, CAST(i AS INT) + 1))) " +
          "ELSE array() END"))
      .withColumn("dup_big",
        expr("CASE WHEN dl >= 2 THEN " +
          "(dl - 1 - size(array_distinct(bigrams))) * 1000 DIV (dl - 1) " +
          "ELSE CAST(0 AS BIGINT) END"))
    prof
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dup_tok") > DupTokMax or col("dup_big") > DupBigramMax,
          1L).otherwise(0L)).as("n_flagged"),
        expr("sum(dup_tok) DIV count(1)").as("avg_dup_tok_permille"),
        expr("sum(dup_big) DIV count(1)").as("avg_dup_big_permille"))
      .orderBy(col("lang"))
  }

  val q164Oracle: String =
    s"""WITH d AS (
       |  SELECT lang,
       |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT lang, CAST(len(toks) AS BIGINT) AS dl,
       |         (CAST(len(toks) AS BIGINT) -
       |          len(list_distinct(toks))) * 1000
       |           // CAST(len(toks) AS BIGINT) AS dup_tok,
       |         CASE WHEN len(toks) >= 2 THEN
       |           (CAST(len(toks) AS BIGINT) - 1 -
       |            len(list_distinct(list_transform(range(1, len(toks)),
       |              i -> toks[i] || ' ' || toks[i + 1])))) * 1000
       |             // (CAST(len(toks) AS BIGINT) - 1)
       |         ELSE 0 END AS dup_big
       |  FROM d WHERE len(toks) > 0)
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN dup_tok > $DupTokMax
       |                       OR dup_big > $DupBigramMax
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |       CAST(sum(dup_tok) AS BIGINT) // count(*)
       |         AS avg_dup_tok_permille,
       |       CAST(sum(dup_big) AS BIGINT) // count(*)
       |         AS avg_dup_big_permille
       |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q167

  /** Docs reported by the surprisal ranking. */
  val SurprisalTop = 25

  /** q167: integer-exact unigram surprisal scoring — the perplexity
    * proxy a quality-filtering pass ranks on, with the float log
    * replaced by the EXACT bit-length identity
    * `floor(log2 x) = length(bin(x)) − 1` (both engines render bin()
    * identically, so the score is a BIGINT no FP rounding can fork).
    * A token's surprisal is floor(log2 N) − floor(log2 cnt) ≥ 0; a
    * doc's score is the tf-weighted mean in permille. High scores =
    * rare-token-heavy docs (OOV-ish, noisy, or genuinely novel); low
    * scores = stopword soup — both tails are curation targets.
    *
    * Scale shape: the (doc, token) tf aggregate rides one shuffle of
    * 8-byte-hashable pairs; the vocabulary count table (Heaps-law
    * sublinear in the corpus) joins back on the token key under AQE
    * (broadcast when it fits, skew-split when hot stopwords dominate);
    * the per-doc fold is a second keyed aggregate; top-k is
    * TakeOrderedAndProject. No driver-sized state anywhere.
    */
  def q167(spark: SparkSession, dir: String): DataFrame = {
    val tf = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("cnt"))
    val totals = vocab.agg(sum(col("cnt")).as("n_total"))
    tf.join(vocab, "tok")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("lang"), col("tf"),
        (length(expr("bin(n_total)")) - length(expr("bin(cnt)")))
          .cast("long").as("surp"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tf")).as("dl"),
        sum(col("tf") * col("surp")).as("surp_sum"))
      .select(col("doc_id"), col("lang"), col("dl"),
        expr("1000 * surp_sum DIV dl").as("surp_permille"))
      .orderBy(col("surp_permille").desc, col("doc_id"))
      .limit(SurprisalTop)
  }

  val q167Oracle: String =
    s"""WITH tf AS (
       |  SELECT doc_id, lang, tok, count(*) AS tf FROM (
       |    SELECT doc_id, lang,
       |           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |    FROM documents) u
       |  GROUP BY doc_id, lang, tok),
       |vocab AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY tok),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM vocab),
       |sc AS (
       |  SELECT tf.doc_id, tf.lang, tf.tf,
       |         CAST(length(bin(t.n_total)) - length(bin(v.cnt)) AS BIGINT) AS surp
       |  FROM tf JOIN vocab v USING (tok) CROSS JOIN tot t)
       |SELECT doc_id, lang, CAST(sum(tf) AS BIGINT) AS dl,
       |       1000 * CAST(sum(tf * surp) AS BIGINT) // CAST(sum(tf) AS BIGINT)
       |         AS surp_permille
       |FROM sc GROUP BY doc_id, lang
       |ORDER BY surp_permille DESC, doc_id LIMIT $SurprisalTop""".stripMargin

  // ---------------------------------------------------------------- q96

  /** Sliding-window document chunking — the RAG/pretraining splitter:
    * window of [[ChunkW]] whitespace tokens advancing by [[ChunkS]]
    * (8-token overlap), one output row per chunk with its 60-bit
    * content hash. The trailing chunk keeps whatever tokens remain
    * (standard chunker behavior; it is never empty because starts stop
    * at the last token index).
    *
    * Scale shape: pure narrow map — split, sequence, explode, slice,
    * hash; no shuffle before the final order-by (which the driver's
    * compare needs, not the operator). Chunk count per doc is
    * ceil(n/S) ≤ n, so output is O(corpus tokens) with no blowup.
    */
  val ChunkW = 32
  val ChunkS = 24

  def q96(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - 1, $ChunkS)")).as("start"))
      .select(col("doc_id"),
        (col("start") / ChunkS).cast("long").as("chunk_id"),
        expr(s"slice(toks, start + 1, $ChunkW)").as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tok"),
        CrossHash.h60(array_join(col("chunk"), " ")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val q96Oracle: String = {
    val slice = s"list_slice(toks, start + 1, start + $ChunkW)"
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, toks,
       |         unnest(range(0, len(toks), $ChunkS)) AS start
       |  FROM t WHERE len(toks) > 0)
       |SELECT doc_id,
       |       CAST(start / $ChunkS AS BIGINT) AS chunk_id,
       |       CAST(len($slice) AS BIGINT) AS n_tok,
       |       ${CrossHash.h60Sql(s"array_to_string($slice, ' ')")} AS chunk_hash
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ---------------------------------------------------------------- q60

  /** Text normalization for dedup/curation: lowercase, collapse
    * everything but [a-z0-9 ] to spaces, squeeze runs, trim — then
    * fingerprint the normal form and count its duplicates via a window.
    * The normalize chain is pure narrow projection (regex semantics
    * identical across engines for this ASCII character class); only the
    * dup-count shuffles, on the fingerprint.
    */
  def q60(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    table(spark, dir, "documents")
      .withColumn("norm_md5", md5(norm))
      .withColumn("norm_len", length(norm).cast("long"))
      .withColumn("n_same_norm",
        count(lit(1)).over(Window.partitionBy(col("norm_md5"))))
      .select(col("doc_id"), col("lang"), col("norm_len"),
        col("norm_md5"), col("n_same_norm"))
      .orderBy(col("doc_id"))
  }

  val q60Oracle: String =
    """WITH n AS (
      |  SELECT doc_id, lang,
      |         trim(regexp_replace(regexp_replace(lower(text),
      |              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT doc_id, lang,
      |       CAST(length(norm) AS BIGINT) AS norm_len,
      |       md5(norm) AS norm_md5,
      |       count(*) OVER (PARTITION BY md5(norm)) AS n_same_norm
      |FROM n ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61

  /** Per-(lang, band) membership cap for q61's pair blocks — the
    * hot-bucket discipline ([[Dedup.MaxBucketDocs]]'s pattern): the
    * band count is bounded by the max document length, so WITHOUT a
    * cap each cell grows linearly with the corpus and the pair pass
    * is quadratic (round 9 measured 12× wall at 10× data). Capping
    * membership bounds every cell's pair fan-out at cap·(cap−1)/2;
    * the rank runs on exactly the join keys, so its exchange IS the
    * join's exchange. Mirrored verbatim in the oracle's QUALIFY.
    */
  private[graft] val Q61CellCap = 32

  /** Token-set algebra between same-language document pairs:
    * |A ∩ B|, |A ∪ B| and exact Jaccard from array_intersect/array_union
    * over deduplicated whitespace tokens. Sizes are exact ints; the
    * Jaccard is one int/int division — bit-equal across engines.
    *
    * Pairs are blocked on (lang, 50-char length band): near-dups have
    * similar lengths, so the band prunes ~10× of the quadratic work AND
    * multiplies the join-key cardinality — joining on lang alone puts
    * the whole dominant-language block in ONE reducer task (observed
    * 5.4 s at sf0.1, single straggler; banded: ~60 cells, 0.6 s).
    * Cell membership is bounded by [[Q61CellCap]] (lowest doc_ids keep
    * their seat — deterministic, oracle-mirrored), so total pair volume
    * is cells × cap², linear in the corpus at any scale.
    */
  def q61(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 50).cast("long").as("band"),
        array_distinct(split(lower(col("text")), " +")).as("toks"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), col("band")).orderBy(col("doc_id"))))
      .filter(col("rn") <= Q61CellCap)
      .drop("rn")
    val a = toks.toDF("id_a", "lang", "band", "toks_a")
    val b = toks.toDF("id_b", "lang_b", "band_b", "toks_b")
    a.join(b, col("lang") === col("lang_b") &&
        col("band") === col("band_b") && (col("id_a") < col("id_b")))
      .select(
        col("lang"), col("id_a"), col("id_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long")
          .as("n_inter"),
        size(array_union(col("toks_a"), col("toks_b"))).cast("long")
          .as("n_union"))
      .withColumn("jacc", col("n_inter") / col("n_union"))
      .orderBy(col("lang"), col("id_a"), col("id_b"))
  }

  val q61Oracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, CAST(floor(n_chars / 50) AS BIGINT) AS band,
      |         list_distinct(string_split_regex(lower(text), ' +')) AS toks
      |  FROM documents WHERE doc_id % 5 = 0
      |  QUALIFY row_number() OVER (PARTITION BY lang, band
      |                             ORDER BY doc_id) <= $Q61CellCap)
      |SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
      |       CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT)
      |         AS n_union,
      |       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |         len(list_distinct(list_concat(a.toks, b.toks))) AS jacc
      |FROM t a JOIN t b
      |  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      |ORDER BY a.lang, id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_text_tokens" -> (q18 _),
    "q25_langid_markers" -> (q25 _),
    "q26_quality_score" -> (q26 _),
    "q27_token_count" -> (q27 _),
    "q28_fingerprint" -> (q28 _),
    "q172_gopher_rules" -> (q172 _),
    "q72_repetition_ratio" -> (q72 _),
    "q73_pii_redact" -> (q73 _),
    "q111_kwic_spans" -> (q111 _),
    "q217_readability" -> (q217 _),
    "q223_bigram_surprisal" -> (q223 _),
    "q164_repetition_profile" -> (q164 _),
    "q167_surprisal_score" -> (q167 _),
    "q96_doc_chunks" -> (q96 _),
    "q60_text_normalize" -> (q60 _),
    "q61_token_setops" -> (q61 _))

  val oracles: Map[String, String] = Map(
    "q18_text_tokens" -> q18Oracle,
    "q25_langid_markers" -> q25Oracle,
    "q26_quality_score" -> q26Oracle,
    "q27_token_count" -> q27Oracle,
    "q28_fingerprint" -> q28Oracle,
    "q172_gopher_rules" -> q172Oracle,
    "q72_repetition_ratio" -> q72Oracle,
    "q73_pii_redact" -> q73Oracle,
    "q111_kwic_spans" -> q111Oracle,
    "q217_readability" -> q217Oracle,
    "q223_bigram_surprisal" -> q223Oracle,
    "q164_repetition_profile" -> q164Oracle,
    "q167_surprisal_score" -> q167Oracle,
    "q96_doc_chunks" -> q96Oracle,
    "q60_text_normalize" -> q60Oracle,
    "q61_token_setops" -> q61Oracle)
}
