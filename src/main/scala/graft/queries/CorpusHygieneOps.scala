package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash

/** Corpus-hygiene statistics — cross-language mirror
  * detection (q254) and the Good–Turing unseen-shingle mass (q255).
  */
object CorpusHygieneOps {

  // ---------------------------------------------------------------- q254

  /** q254: CROSS-LANGUAGE mirror detection — documents whose exact
    * content ships under MORE THAN ONE language tag. In a crawled
    * corpus that is almost never real parallel text: it is boilerplate
    * served on every locale of a site, or a langid/scraper bug — and
    * either way it poisons per-language statistics (every per-lang
    * readout q114/q165/q241 stratifies on trusts the tag). Per
    * language: corpus size, docs whose fingerprint also appears under
    * another language, and the mirror permille.
    *
    * Scale shape: one corpus scan → (fp, lang) projection; the
    * distinct-language count shuffles on the 8-byte fp (groups are
    * ≤ #langs wide, so no skew); the flag joins back on fp and the
    * report lands on the language domain.
    *
    * Regime coverage: sf0.01 has no cross-language collisions (the
    * all-zero path), sf0.1 has 7 mirrored fingerprints — the two gates
    * pin both branches (the q243/q253 pattern).
    */
  def q254(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
      .select(col("lang"), CrossHash.h60(col("text")).as("fp"))
    val mirrored = d.groupBy(col("fp"))
      .agg(countDistinct(col("lang")).as("nl"))
      .filter(col("nl") > 1)
      .select(col("fp")).withColumn("hit", lit(true))
    d.join(mirrored, Seq("fp"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_mirrored"))
      .withColumn("mirror_permille",
        expr("(1000 * n_mirrored) div n_docs"))
      .orderBy(col("lang"))
  }

  val q254Oracle: String = {
    val fp = CrossHash.h60Sql("text")
    s"""WITH d AS (
       |  SELECT lang, $fp AS fp FROM documents),
       |mirrored AS (
       |  SELECT fp FROM d GROUP BY fp
       |  HAVING count(DISTINCT lang) > 1)
       |SELECT d.lang, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN m.fp IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_mirrored,
       |       (1000 * CAST(sum(CASE WHEN m.fp IS NOT NULL THEN 1 ELSE 0 END)
       |                    AS BIGINT)) // count(*) AS mirror_permille
       |FROM d LEFT JOIN mirrored m ON d.fp = m.fp
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  // ---------------------------------------------------------------- q255

  /** q255: GOOD–TURING unseen mass over 3-word shingles — "how much of
    * the language have we NOT crawled yet?" The Turing estimator
    * P(next shingle is novel) = N₁/N (hapax instances over total
    * instances; Gale & Sampson 1995's simple Good–Turing uses exactly
    * this mass) is the statistic behind every "is more data worth it"
    * call the vocab-growth curve (q129) eyeballs. Also reports the
    * discounted hapax count c₁* = 2·N₂/N₁ in milli — how much a
    * once-seen shingle's count should be believed. Word-level hapaxes
    * are zero on this corpus (31-type vocabulary), so the statistic
    * lives at the shingle level, where the combinatorial space is
    * actually open — the same reason q21's near-dup banding shingles
    * instead of tokenizing.
    *
    * Scale shape: per-doc shingles assemble INSIDE codegen (the q223
    * transform — no positional self-join); one shuffle on (lang,
    * shingle) builds the count table; everything after is a
    * lang-domain aggregate. Integer end to end.
    */
  def q255(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("lang"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("lang"), explode(expr(
        "transform(slice(toks, 3, size(toks) - 2)," +
          " (x, i) -> concat(element_at(toks, i + 1), ' '," +
          " element_at(toks, i + 2), ' ', x))")).as("sh"))
      .groupBy(col("lang"), col("sh")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("lang"))
      .agg(
        sum(col("cnt")).as("n_instances"),
        count(lit(1)).as("n_types"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("n_dis"))
      .withColumn("unseen_permille",
        expr("(1000 * n_hapax) div n_instances"))
      .withColumn("c1_star_milli",
        expr("(2000 * n_dis) div nullif(n_hapax, 0)"))
      .orderBy(col("lang"))

  val q255Oracle: String =
    """WITH d AS (
      |  SELECT lang,
      |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT lang,
      |         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
      |  FROM d, unnest(range(1, len(toks) - 1)) AS u(i)
      |  WHERE len(toks) >= 3),
      |cnts AS (
      |  SELECT lang, sh, count(*) AS cnt FROM sh GROUP BY lang, sh)
      |SELECT lang,
      |       CAST(sum(cnt) AS BIGINT) AS n_instances,
      |       count(*) AS n_types,
      |       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_hapax,
      |       CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_dis,
      |       (1000 * CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
      |                    AS BIGINT)) // CAST(sum(cnt) AS BIGINT)
      |         AS unseen_permille,
      |       (2000 * CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)
      |                    AS BIGINT)) //
      |         nullif(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
      |                     AS BIGINT), 0) AS c1_star_milli
      |FROM cnts GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q142

  /** How many docs the uniqueness screen reports. */
  val UniqTopK = 25

  /** Shingle-uniqueness score: per document, the per-mille of its
    * distinct 5-token shingles that occur in NO other document —
    * near 0 flags boilerplate/templated text a dedup pass should
    * inspect, near 1000 flags novel content worth keeping. The
    * uniqueness twin of q121's release-novelty score (which compares
    * two snapshots; this ranks docs within one corpus). Reported as
    * the [[UniqTopK]] LEAST-unique docs (ascending): the fully-unique
    * end saturates at 1000‰ on any healthy corpus, while the
    * boilerplate end is where a curation pass acts — and where the
    * scores actually discriminate (pinned by ArchetypePack2Spec).
    *
    * Scale shape: per-doc-distinct shingles hashed to 8-byte keys by
    * the native expression BEFORE the one shuffle-on-h, where the
    * document frequency rides as a window count
    * ([[Shingles.hashesWithDf]] — no groupBy+join-back second corpus
    * pass); the per-doc rollup then shuffles only (doc_id, df-class)
    * partial counts. Uniqueness is hash-exact in both engines (both
    * classify the same 60-bit keys), so no collision contract is
    * needed in the oracle.
    */
  def q142(spark: SparkSession, dir: String): DataFrame =
    Shingles.hashesWithDf(table(spark, dir, "documents"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        expr("(1000 * n_unique) div n_shingles").as("uniq_permille"))
      .orderBy(col("uniq_permille"), col("doc_id"))
      .limit(UniqTopK)

  val q142Oracle: String =
    "WITH " + Shingles.rareCteSql + ",\n" +
      s"""dfd AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY hh) AS df FROM hs),
         |sc AS (
         |  SELECT doc_id, count(*) AS n_shingles,
         |         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_unique
         |  FROM dfd GROUP BY doc_id)
         |SELECT doc_id, n_shingles, n_unique,
         |       CAST((1000 * n_unique) // n_shingles AS BIGINT)
         |         AS uniq_permille
         |FROM sc
         |ORDER BY uniq_permille, doc_id
         |LIMIT $UniqTopK""".stripMargin

  // ---------------------------------------------------------------- q101

  /** Cross-document repeated-passage detection: hash EVERY [[RpW]]-token
    * window (stride 1, the native digest-streaming [[WordShingles60]])
    * and report the top 50 window hashes that appear in ≥ 2 distinct
    * documents. Stride 1 is what makes the detector alignment-invariant
    * — a shared run of L ≥ W tokens produces L−W+1 colliding windows in
    * each copy no matter where the run sits in either document. (The
    * cheaper non-overlapping tiling halves the hash count but only
    * catches copies at offsets congruent mod W — a first draft of this
    * query did exactly that, and its own spec's misaligned-run fixture
    * refuted it.) This is the distributable stand-in for suffix-array
    * substring dedup (Lee et al. 2021): passage granularity, bounded
    * state, no global sort.
    *
    * Scale shape: narrow split→shingle→hash map with no pre-shuffle and
    * no intermediate shingle strings (the native expression streams
    * token bytes straight into the digest), ONE partial+final aggregate
    * on 8-byte keys, top-50 via TakeOrderedAndProject. Output is
    * bounded by the limit; aggregate state by the distinct-window
    * domain, never by document sizes.
    */
  val RpW = 16

  def q101(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= RpW)
      .select(col("doc_id"),
        explode(
          graft.functions.WordShingles60.wordShingles60(col("toks"), RpW))
          .as("chunk_hash"))
      .groupBy(col("chunk_hash"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occ").desc, col("n_docs").desc, col("chunk_hash"))
      .limit(50)

  val q101Oracle: String = {
    val leads = (1 until RpW)
      .map(j => s"|| ' ' || lead(tok, $j) OVER w ").mkString
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE tok <> ''),
       |sh AS (
       |  SELECT doc_id, tok $leads AS shingle
       |  FROM toks
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |c AS (
       |  SELECT doc_id, ${CrossHash.h60Sql("shingle")} AS chunk_hash
       |  FROM sh WHERE shingle IS NOT NULL),
       |g AS (
       |  SELECT chunk_hash,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |         count(*) AS n_occ,
       |         CAST(min(doc_id) AS BIGINT) AS first_doc
       |  FROM c GROUP BY chunk_hash
       |  HAVING count(DISTINCT doc_id) >= 2)
       |SELECT chunk_hash, n_docs, n_occ, first_doc
       |FROM g ORDER BY n_occ DESC, n_docs DESC, chunk_hash LIMIT 50""".stripMargin
  }

  // ---------------------------------------------------------------- q100

  /** End-to-end curation funnel in ONE scan — the composition
    * showpiece: quality gate → normalized-fingerprint dedup (keep the
    * lowest doc_id among quality survivors) → deterministic 80%
    * sample, reported as per-stage survivor stats (stage 0 ingested,
    * 1 quality-passed, 2 deduped, 3 sampled).
    *
    * Every decision is integer-only (token/char counts, a 60-bit
    * cross-engine hash for both the fingerprint and the sample
    * bucket), so the funnel is bit-reproducible and resumable — the
    * q56 argument, applied to the whole pipeline. Each doc gets the
    * furthest stage it reached via one fingerprint window (running
    * count of earlier quality survivors — no self-join), then
    * explodes onto stages 0..label so a single partial+final
    * aggregate yields the funnel. Scale shape: one corpus scan, one
    * window shuffle on the 8-byte fingerprint, a ≤4-row result;
    * at 100 TB this is the shape you want (the alternative — one
    * filter+count action per stage — rescans the corpus four times).
    */
  def q100(spark: SparkSession, dir: String): DataFrame = {
    val flags = table(spark, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_tokens",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in')))")
          .cast("long"))
      .withColumn("qual_ok",
        col("n_tokens") >= 15 && length(col("text")) >= 80 &&
          length(col("text")) <= 5000 &&
          col("stop_tokens") * 10 <= col("n_tokens") * 6)
      .withColumn("fp",
        // explicit whitespace class: Java's \s and RE2's \s disagree on
        // \x0B, and the fingerprint must be bit-identical cross-engine
        CrossHash.h60(regexp_replace(lower(col("text")), "[ \t\n\r]+", " ")))
      .withColumn("smp",
        CrossHash.h60(concat(lit("cur:"), col("doc_id").cast("string"))) % 100)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    flags
      .withColumn("n_prior",
        coalesce(sum(when(col("qual_ok"), 1L).otherwise(0L)).over(w), lit(0L)))
      .withColumn("label",
        when(!col("qual_ok"), 0)
          .when(col("n_prior") > 0, 1)
          .when(col("smp") >= 80, 2)
          .otherwise(3))
      .select(col("doc_id"), col("n_tokens"),
        explode(expr("sequence(0, label)")).as("stage_i"))
      .select(col("doc_id"), col("n_tokens"),
        col("stage_i").cast("long").as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_sum"),
        sum(col("n_tokens")).as("tok_sum"))
      .orderBy(col("stage"))
  }

  val q100Oracle: String = {
    val fp = CrossHash.h60Sql(
      "regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g')")
    val smp = CrossHash.h60Sql("'cur:' || CAST(doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |         len(list_filter(string_split(text, ' '), t -> t <> ''))
       |           AS n_tokens,
       |         length(text) AS n_chars,
       |         len(list_filter(string_split(text, ' '),
       |             t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS stop_tokens
       |  FROM documents),
       |flags AS (
       |  SELECT doc_id, n_tokens,
       |         (n_tokens >= 15 AND n_chars >= 80 AND n_chars <= 5000
       |          AND stop_tokens * 10 <= n_tokens * 6) AS qual_ok,
       |         $fp AS fp,
       |         ($smp) % 100 AS smp
       |  FROM base),
       |ranked AS (
       |  SELECT *, coalesce(sum(CASE WHEN qual_ok THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY fp ORDER BY doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           0) AS n_prior
       |  FROM flags),
       |lab AS (
       |  SELECT doc_id, n_tokens,
       |         CASE WHEN NOT qual_ok THEN 0
       |              WHEN n_prior > 0 THEN 1
       |              WHEN smp >= 80 THEN 2 ELSE 3 END AS label
       |  FROM ranked),
       |expanded AS (
       |  SELECT unnest(generate_series(0, label)) AS stage, doc_id, n_tokens
       |  FROM lab)
       |SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_docs,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum
       |FROM expanded GROUP BY stage ORDER BY stage""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q254_crosslang_mirror" -> (q254 _),
    "q255_good_turing" -> (q255 _),
    "q142_shingle_uniqueness" -> (q142 _),
    "q101_repeated_chunks" -> (q101 _),
    "q100_curation_funnel" -> (q100 _))

  val oracles: Map[String, String] = Map(
    "q254_crosslang_mirror" -> q254Oracle,
    "q255_good_turing" -> q255Oracle,
    "q142_shingle_uniqueness" -> q142Oracle,
    "q101_repeated_chunks" -> q101Oracle,
    "q100_curation_funnel" -> q100Oracle)
}
