package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash.h60Sql

/** Document-fingerprinting probes: winnowing fingerprint selection (q207) and Burrows'
  * Delta stopword stylometry (q208) — two curation probes the 205-query
  * surface lacked: a POSITION-AWARE local fingerprinting scheme (the
  * MOSS primitive, guaranteeing detection of any shared passage above a
  * length threshold at ~2/(w+1) index density) and an authorship/
  * generator drift screen over function-word rates.
  */
object FingerprintOps {

  // ---------------------------------------------------------------- q207

  /** Shingle width (tokens per k-gram) for winnowing. */
  val WinnowK = 4

  /** Winnow window: hashes per selection window. Guarantee threshold
    * t = WinnowK + WinnowW − 1 = 7 tokens — any passage of ≥ t tokens
    * shared between two documents shares at least one selected
    * fingerprint (Schleimer/Wilkerson/Aiken 2003, theorem 1).
    */
  val WinnowW = 4

  /** q207: winnowing fingerprint selection (Schleimer, Wilkerson &
    * Aiken, SIGMOD 2003 — the MOSS scheme): hash every k-token shingle
    * IN ORDER, slide a w-hash window, keep each window's minimum; the
    * distinct kept values are the document's fingerprint index. Unlike
    * MinHash (q21 — a global sketch of the whole set), winnowing is
    * LOCAL: every stretch of w+k−1 tokens contributes a fingerprint, so
    * partial overlaps anywhere in a document are guaranteed
    * discoverable, at ~2/(w+1) of full-index density. Reported per
    * language: docs, total grams, selected fingerprints, and the
    * density in permille (theory: ≈ 2000/(w+1) = 400‰ for random
    * hashes — the audit that the selection is neither degenerate nor
    * over-dense).
    *
    * Scale shape: the gram stream leaves each row as 8-byte native
    * hashes ([[graft.functions.WordShingles60]] — no shingle strings);
    * the ONLY corpus exchange is the doc-id partition for the window
    * min (per-doc window, bounded by doc length, never skewed by
    * corpus size); the distinct and the per-doc rollup reuse the same
    * doc-keyed partitioning, and the final aggregate lands on the
    * language domain. Value-distinct winnow sets (positions dropped
    * after selection) — the variant a dedup INDEX stores.
    */
  /** Ordered k-gram hash stream (doc_id, keep..., pos, h) of a
    * (doc_id, text, ...) frame, for docs long enough to hold one full
    * winnow window. Shared by the batch queries and
    * [[graft.streaming.StreamingWinnow]] so the live probe can never
    * disagree with the batch index on what a fingerprint is.
    */
  private[graft] def gramStreamOf(
      docs: DataFrame, keep: Seq[String]): DataFrame =
    docs
      .select((col("doc_id") +: keep.map(col)) :+
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"): _*)
      .filter(size(col("toks")) >= WinnowK + WinnowW - 1)
      .select((col("doc_id") +: keep.map(col)) :+
        posexplode(graft.functions.WordShingles60
          .wordShingles60(col("toks"), WinnowK)).as(Seq("pos", "h")): _*)

  private def gramStream(spark: SparkSession, dir: String): DataFrame =
    gramStreamOf(table(spark, dir, "documents"), Seq("lang"))

  /** Value-distinct winnow selection per doc: (doc_id, keep..., wh). */
  private[graft] def selectedFpsOf(
      grams: DataFrame, keep: Seq[String]): DataFrame = {
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(WinnowW - 1), 0)
    grams
      .withColumn("wh", min(col("h")).over(win))
      .filter(col("pos") >= WinnowW - 1) // full windows only (0-based)
      .select((col("doc_id") +: keep.map(col)) :+ col("wh"): _*).distinct()
  }

  private def selectedFps(grams: DataFrame): DataFrame =
    selectedFpsOf(grams, Seq("lang"))

  def q207(spark: SparkSession, dir: String): DataFrame = {
    val grams = gramStream(spark, dir)
    val perDocSel = selectedFps(grams)
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_selected"))
    val perDocGrams = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    perDocSel.join(perDocGrams, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_grams")).as("n_grams"),
        sum(col("n_selected")).as("n_selected"))
      .select(col("lang"), col("n_docs"), col("n_grams"), col("n_selected"),
        expr("1000 * n_selected DIV n_grams").as("density_permille"))
      .orderBy(col("lang"))
  }

  val q207Oracle: String = {
    val leads = (1 until WinnowK)
      .map(i => s"|| ' ' || lead(tok, $i) OVER w ").mkString
    s"""WITH toks AS (
       |  SELECT doc_id, lang, tok, pos FROM (
       |    SELECT doc_id, lang,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE tok <> ''),
       |sh AS (
       |  SELECT doc_id, lang, pos, tok $leads AS shingle
       |  FROM toks
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |g AS (
       |  SELECT doc_id, lang,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
       |         ${h60Sql("shingle")} AS h
       |  FROM sh WHERE shingle IS NOT NULL),
       |wm AS (
       |  SELECT doc_id, lang, rn,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY rn
       |                      ROWS BETWEEN ${WinnowW - 1} PRECEDING
       |                      AND CURRENT ROW) AS wh
       |  FROM g),
       |sel AS (
       |  SELECT doc_id, lang, count(DISTINCT wh) AS n_selected
       |  FROM wm WHERE rn >= $WinnowW GROUP BY doc_id, lang),
       |tot AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id)
       |SELECT s.lang, count(*) AS n_docs,
       |       CAST(sum(t.n_grams) AS BIGINT) AS n_grams,
       |       CAST(sum(s.n_selected) AS BIGINT) AS n_selected,
       |       CAST(1000 * sum(s.n_selected) // sum(t.n_grams) AS BIGINT)
       |         AS density_permille
       |FROM sel s JOIN tot t ON t.doc_id = s.doc_id
       |GROUP BY s.lang ORDER BY s.lang""".stripMargin
  }

  // ---------------------------------------------------------------- q208

  /** Function-word panel for the Delta profile — high-frequency,
    * topic-free words (Burrows' criterion), fixed and literal so both
    * engines rate the identical panel.
    */
  val DeltaPanel: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is", "for")

  /** q208: Burrows' Delta over sources (Burrows 2002, "'Delta': a
    * measure of stylistic difference"): per-source function-word rates
    * in integer permille, z-scored against the cross-source
    * distribution, mean |z| per source in integer micro-units. A
    * source whose function-word profile sits far from the corpus
    * (high delta) is stylometrically anomalous — a scraped template
    * farm, a machine-generation run, or a different register — the
    * source-level screen q26/q172's per-document shape rules can't
    * see.
    *
    * Determinism discipline: rates are INTEGERS (permille, truncated
    * DIV); per-word mean/std come from integer moment sums combined in
    * doubles (the q189 rule — one spelling, identical IEEE ops on both
    * engines; population variance, zero-variance words contribute 0
    * via nullif+coalesce); each |z| is floor-quantized to micro-units
    * BEFORE the per-source sum, so the fold is an integer sum — order-
    * independent where a float Σ|z| would drift with partitioning.
    *
    * Scale shape: one corpus token pass → (source, word) counts on a
    * sources×8 domain; everything after runs on that bounded frame
    * (the q182 spine argument); panel membership is a literal IN list
    * evaluated map-side.
    */
  def q208(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val panelSql = DeltaPanel.map(w => s"'$w'").mkString(", ")
    val toks = table(spark, dir, "documents")
      .select(col("source"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
    val totals = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"))
    val counts = toks.filter(expr(s"tok IN ($panelSql)"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    // zero-filled (source, word) spine: a source missing a panel word
    // still rates 0 there (and that zero informs the z-score)
    val words = DeltaPanel.toDF("tok")
    val rates = totals.crossJoin(broadcast(words))
      .join(counts, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"), col("n_tokens"),
        expr("1000 * coalesce(c, 0) DIV n_tokens").as("r"))
    // int64 budget (engine + oracle m CTE): r is a permille rate in
    // [0, 1000] so r·r ≤ 10⁶, and the moment sums over SOURCES — up to
    // ~2⁴³ sources keeps n·10⁶ < 2⁶³; never corpus-scale values
    val moments = rates.groupBy(col("tok"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("s"),
        sum(col("r") * col("r")).as("sq"))
    rates.join(broadcast(moments), Seq("tok"))
      .select(col("source"), col("n_tokens"),
        coalesce(
          floor(abs((col("r") - expr("CAST(s AS DOUBLE) / n")) /
            nullif(sqrt(
              expr("(CAST(n AS DOUBLE) * sq - CAST(s AS DOUBLE) * s)") /
                expr("CAST(n AS DOUBLE) * n")), lit(0.0))) * 1000000d)
            .cast("long"),
          lit(0L)).as("z_micro"))
      .groupBy(col("source"))
      .agg(max(col("n_tokens")).as("n_tokens"),
        sum(col("z_micro")).as("z_sum_micro"))
      .select(col("source"), col("n_tokens"),
        expr(s"z_sum_micro DIV ${DeltaPanel.size}").as("delta_micro"))
      .orderBy(col("delta_micro").desc, col("source"))
  }

  val q208Oracle: String = {
    val panelSql = DeltaPanel.map(w => s"('$w')").mkString(", ")
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |tf AS (SELECT source, tok FROM toks WHERE tok <> ''),
       |totals AS (SELECT source, count(*) AS n_tokens FROM tf GROUP BY source),
       |words(tok) AS (VALUES $panelSql),
       |counts AS (
       |  SELECT source, tok, count(*) AS c FROM tf
       |  WHERE tok IN (SELECT tok FROM words) GROUP BY source, tok),
       |rates AS (
       |  SELECT t.source, w.tok, t.n_tokens,
       |         1000 * COALESCE(c.c, 0) // t.n_tokens AS r
       |  FROM totals t CROSS JOIN words w
       |  LEFT JOIN counts c ON c.source = t.source AND c.tok = w.tok),
       |m AS (
       |  SELECT tok, count(*) AS n, sum(r) AS s, sum(r * r) AS sq
       |  FROM rates GROUP BY tok),
       |z AS (
       |  SELECT r.source, r.n_tokens,
       |         COALESCE(CAST(floor(abs(
       |             (r.r - CAST(m.s AS DOUBLE) / m.n) /
       |             nullif(sqrt((CAST(m.n AS DOUBLE) * m.sq
       |                          - CAST(m.s AS DOUBLE) * m.s)
       |                         / (CAST(m.n AS DOUBLE) * m.n)), 0.0))
       |           * 1000000) AS BIGINT), 0) AS z_micro
       |  FROM rates r JOIN m ON m.tok = r.tok)
       |SELECT source, CAST(max(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(sum(z_micro) // ${DeltaPanel.size} AS BIGINT)
       |         AS delta_micro
       |FROM z GROUP BY source
       |ORDER BY delta_micro DESC, source""".stripMargin
  }

  // ---------------------------------------------------------------- q210

  /** Hot-fingerprint cap for q210's pair join: a winnow value shared by
    * more docs than this is boilerplate (the [[Dedup.MaxBucketDocs]]
    * hazard — one viral footer makes the join quadratic in ITS bucket)
    * and is excluded from pairing.
    */
  val WinnowMaxDf = 64

  /** Minimum shared fingerprints before a pair is reported. */
  val WinnowMinShared = 3L

  /** Pairs reported by q210. */
  val WinnowTop = 30

  /** q210: the DETECTION half of MOSS — probe the q207 winnow index
    * for document pairs sharing ≥ [[WinnowMinShared]] selected
    * fingerprints, with the shared count and the containment permille
    * against the SMALLER doc's fingerprint set (a near-total
    * containment of a small doc inside a big one scores ~1000‰ where
    * symmetric measures dilute it — the quote/extract case). By the
    * winnowing guarantee every shared passage ≥ k+w−1 tokens
    * contributes at least one shared fingerprint, so recall over
    * passages of that length is structural, at ~2/(w+1) of the
    * full-shingle index cost that q123's rare-shingle machinery pays.
    *
    * Scale shape: the pair join runs over the winnow-SELECTED frame
    * (≈40% of grams), bucketed by fingerprint value with the
    * [[WinnowMaxDf]] hot-bucket cap bounding any bucket's fan-out —
    * never all-pairs; per-doc set sizes ride a tiny re-aggregation;
    * top-k is TakeOrderedAndProject under a literal bound.
    */
  def q210(spark: SparkSession, dir: String): DataFrame = {
    val sel = selectedFps(gramStream(spark, dir))
      .select(col("doc_id"), col("wh")).localCheckpoint()
    val pairable = sel.join(
      sel.groupBy(col("wh")).agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, WinnowMaxDf))
        .select(col("wh")),
      Seq("wh"), "left_semi")
    val shared = pairable.toDF("wh", "doc_a")
      .join(pairable.toDF("wh", "doc_b"),
        Seq("wh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= WinnowMinShared)
    val sizes = sel.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sel"))
    shared
      .join(sizes.toDF("doc_a", "sel_a"), Seq("doc_a"))
      .join(sizes.toDF("doc_b", "sel_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        expr("1000 * n_shared DIV least(sel_a, sel_b)")
          .as("containment_permille"))
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
      .limit(WinnowTop)
  }

  val q210Oracle: String = {
    val leads = (1 until WinnowK)
      .map(i => s"|| ' ' || lead(tok, $i) OVER w ").mkString
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE tok <> ''),
       |sh AS (
       |  SELECT doc_id, pos, tok $leads AS shingle
       |  FROM toks
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |g AS (
       |  SELECT doc_id,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn,
       |         ${h60Sql("shingle")} AS h
       |  FROM sh WHERE shingle IS NOT NULL),
       |sel AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY rn
       |           ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW) AS wh
       |  FROM g QUALIFY rn >= $WinnowW),
       |pairable AS MATERIALIZED (
       |  SELECT doc_id, wh FROM sel
       |  WHERE wh IN (SELECT wh FROM sel GROUP BY wh
       |               HAVING count(*) BETWEEN 2 AND $WinnowMaxDf)),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM pairable a JOIN pairable b
       |    ON a.wh = b.wh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= $WinnowMinShared),
       |sizes AS (SELECT doc_id, count(*) AS n_sel FROM sel GROUP BY doc_id)
       |SELECT s.doc_a, s.doc_b, CAST(s.n_shared AS BIGINT) AS n_shared,
       |       CAST(1000 * s.n_shared // least(sa.n_sel, sb.n_sel) AS BIGINT)
       |         AS containment_permille
       |FROM shared s
       |JOIN sizes sa ON sa.doc_id = s.doc_a
       |JOIN sizes sb ON sb.doc_id = s.doc_b
       |ORDER BY n_shared DESC, doc_a, doc_b LIMIT $WinnowTop""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q207_winnowing" -> (q207 _),
    "q208_stopword_delta" -> (q208 _),
    "q210_winnow_overlap" -> (q210 _))

  val oracles: Map[String, String] = Map(
    "q207_winnowing" -> q207Oracle,
    "q208_stopword_delta" -> q208Oracle,
    "q210_winnow_overlap" -> q210Oracle)
}
