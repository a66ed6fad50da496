package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash

/** Dedup meta-audits — blocking recall against the
  * exact-duplicate ground truth (q260) and the kept-set divergence
  * between the two shipped keep policies (q261).
  */
object DedupAuditOps {

  // ---------------------------------------------------------------- q260

  /** q260: BLOCKING RECALL — the one number every blocking scheme owes
    * its users (Christen 2012's pairs-completeness): of the pairs KNOWN
    * to be duplicates (same exact content fingerprint — the only free
    * ground truth a corpus carries), what fraction did the LSH banding
    * actually propose? q147 calibrates the MinHash estimator against
    * true Jaccard; this audits the harder failure — a true duplicate
    * pair that never met in any band is invisible to every downstream
    * consumer (CC, canonical keep, blast radius), no matter how good
    * the estimator is. Exact-dup pairs SHOULD be caught (identical
    * shingle sets ⇒ identical signatures ⇒ same buckets), so the only
    * legitimate misses are hot-bucket-cap evictions — carried in the
    * `n_evicted` column (band rows beyond [[Dedup.MaxBucketDocs]]) so
    * a recall drop is attributable in the output itself.
    *
    * Scale shape: ground-truth pairs come from a self-join on the
    * 8-byte fp key (group sizes = duplicate multiplicities — bounded
    * by data, and the same shape q17 already ships); the membership
    * probe is one co-partitioned join against the memoized
    * [[Dedup.candidatePairs]] frame; the eviction count is one extra
    * banded-signature pass (same cap window the candidate build uses,
    * so the two numbers cannot disagree about WHAT was evicted).
    * Regime coverage: sf0.01 has zero exact dups (the empty-truth
    * branch: 0/0 with recall NULL), sf0.1 has 8 duplicated fps — the
    * q243/q253 two-gate pattern; both gates pin n_evicted = 0 and the
    * hot-bucket fixture in DedupAuditSpec pins it firing.
    */
  def q260(spark: SparkSession, dir: String): DataFrame = {
    val fps = table(spark, dir, "documents")
      .select(col("doc_id"), CrossHash.h60(col("text")).as("fp"))
    val truth = fps.as("a")
      .join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = Dedup.candidatePairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).withColumn("hit", lit(true))
    val evicted = Dedup.bandedSigs(spark, dir)
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("band_idx"), col("bh")).orderBy(col("doc_id"))))
      .agg(sum(when(col("rn") > Dedup.MaxBucketDocs, 1L).otherwise(0L))
        .as("n_evicted"))
    truth.join(cand, Seq("doc_a", "doc_b"), "left")
      .agg(
        count(lit(1)).as("n_true_pairs"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_caught"))
      .withColumn("recall_permille",
        expr("(1000 * n_caught) div nullif(n_true_pairs, 0)"))
      .crossJoin(evicted) // 1-row × 1-row
      .select(col("n_true_pairs"), col("n_caught"), col("recall_permille"),
        col("n_evicted"))
  }

  val q260Oracle: String = {
    val fp = CrossHash.h60Sql("text")
    s"""WITH ${Dedup.q21CandCte},
       |fps AS (SELECT doc_id, $fp AS fp FROM documents),
       |truth AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM fps a JOIN fps b
       |    ON a.fp = b.fp AND a.doc_id < b.doc_id),
       |ev AS (
       |  SELECT CAST(sum(CASE WHEN rn > ${Dedup.MaxBucketDocs}
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_evicted
       |  FROM (
       |    SELECT row_number() OVER (PARTITION BY band_idx, bh
       |                              ORDER BY doc_id) AS rn
       |    FROM bands))
       |SELECT count(*) AS n_true_pairs,
       |       CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_caught,
       |       (1000 * CAST(sum(CASE WHEN c.doc_a IS NOT NULL
       |                             THEN 1 ELSE 0 END) AS BIGINT)) //
       |         nullif(count(*), 0) AS recall_permille,
       |       (SELECT n_evicted FROM ev) AS n_evicted
       |FROM truth t
       |LEFT JOIN (SELECT DISTINCT doc_a, doc_b FROM cand) c
       |  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q261

  /** q261: KEEP-POLICY divergence — q87 keeps each near-dup cluster's
    * MIN-ID member (stable, rerun-friendly), q156 keeps its BEST-QUALITY
    * member (what curation actually wants); this reports how much the
    * choice matters: per language, cluster-member counts, how many
    * clusters pick a DIFFERENT winner under the two policies, and the
    * quality the min-id rule leaves on the table (Σ q_u3(quality pick) −
    * q_u3(min-id pick), exact integer). A near-zero divergence means
    * the cheap policy is fine; a large one prices the upgrade.
    *
    * Scale shape: both winners derive from ONE pass over the memoized
    * CC labels joined to the member quality scores (the labels frame is
    * bounded by the candidate graph, not the corpus): min-id = min over
    * the cluster, quality pick = the q156 rank-1 row — computed with
    * the SAME (q_u3 desc, id) window so the two policies cannot fork
    * from their gated originals; the rollup lands on the language
    * domain (a cluster's language = its min-id member's, a
    * deterministic representative).
    */
  def q261(spark: SparkSession, dir: String): DataFrame = {
    val labels = Dedup.ccLabels(spark, dir)._1
    val members = labels
      .join(table(spark, dir, "documents")
        .select(col("doc_id").as("id"), col("lang"), col("text"),
          col("n_chars")), Seq("id"))
    val scored = Dedup.withQualU3(members)
      .select(col("id"), col("label"), col("lang"), col("q_u3"))
      .localCheckpoint() // bounded by the candidate graph; 3 windows read it
    val wq = Window.partitionBy(col("label"))
      .orderBy(col("q_u3").desc, col("id"))
    val wi = Window.partitionBy(col("label")).orderBy(col("id"))
    scored
      .withColumn("q_rank", row_number().over(wq))
      .withColumn("id_rank", row_number().over(wi))
      .withColumn("min_lang", first(col("lang")).over(wi))
      .withColumn("min_q", first(col("q_u3")).over(wi))
      .filter(col("q_rank") === 1)
      .select(col("min_lang").as("lang"), col("label"),
        (col("id_rank") =!= 1).as("differs"),
        (col("q_u3") - col("min_q")).as("q_gain"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(when(col("differs"), 1L).otherwise(0L)).as("n_differ"),
        sum(col("q_gain")).as("q_gain_total"))
      .withColumn("differ_permille",
        expr("(1000 * n_differ) div n_clusters"))
      .orderBy(col("lang"))
  }

  val q261Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH RECURSIVE ${Dedup.ccWalkCtes},
       |docsq AS (
       |  SELECT doc_id, lang, $qualSql AS q_u3
       |  FROM (
       |    SELECT doc_id, lang, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |scored AS (
       |  SELECT l.id, l.label, d.lang, d.q_u3
       |  FROM labels l JOIN docsq d ON l.id = d.doc_id),
       |ranked AS (
       |  SELECT id, label, lang, q_u3,
       |         row_number() OVER (PARTITION BY label
       |                            ORDER BY q_u3 DESC, id) AS q_rank,
       |         row_number() OVER (PARTITION BY label
       |                            ORDER BY id) AS id_rank,
       |         first_value(lang) OVER (PARTITION BY label
       |                                 ORDER BY id) AS min_lang,
       |         first_value(q_u3) OVER (PARTITION BY label
       |                                 ORDER BY id) AS min_q
       |  FROM scored)
       |SELECT min_lang AS lang, count(*) AS n_clusters,
       |       CAST(sum(CASE WHEN id_rank <> 1 THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_differ,
       |       CAST(sum(q_u3 - min_q) AS BIGINT) AS q_gain_total,
       |       (1000 * CAST(sum(CASE WHEN id_rank <> 1 THEN 1 ELSE 0 END)
       |                    AS BIGINT)) // count(*) AS differ_permille
       |FROM ranked WHERE q_rank = 1
       |GROUP BY min_lang ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q260_blocking_recall" -> (q260 _),
    "q261_keep_policy_diff" -> (q261 _))

  val oracles: Map[String, String] = Map(
    "q260_blocking_recall" -> q260Oracle,
    "q261_keep_policy_diff" -> q261Oracle)
}
