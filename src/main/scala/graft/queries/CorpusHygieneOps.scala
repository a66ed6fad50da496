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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q254_crosslang_mirror" -> (q254 _),
    "q255_good_turing" -> (q255 _),
    "q142_shingle_uniqueness" -> (q142 _))

  val oracles: Map[String, String] = Map(
    "q254_crosslang_mirror" -> q254Oracle,
    "q255_good_turing" -> q255Oracle,
    "q142_shingle_uniqueness" -> q142Oracle)
}
