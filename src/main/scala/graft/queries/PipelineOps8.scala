package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash

/** q110-q113: round-6 fifth widening — graph-adjacent curation ops
  * (one-hop label propagation over the sign-LSH neighbor graph,
  * evaluated against held-out labels q103-style), keyword-in-context
  * span extraction, and the corpus snapshot diff (CDC audit).
  */
object PipelineOps8 {

  // ---------------------------------------------------------------- q110

  /** One-hop label propagation over the q42 sign-LSH graph, evaluated:
    * vectors with vec_id % 5 == 3 act as the UNLABELED set (their true
    * label is held out as ground truth); every other vector votes its
    * label into each band bucket it shares with an unlabeled vector.
    * Prediction = majority vote, ties to the smaller label — integer
    * counts and an integer tie-break, so both engines elect the same
    * label. Output: one row per unlabeled vector that has labeled
    * neighbors, with vote counts and a correctness flag — the
    * measurement a curation pipeline needs before trusting propagated
    * labels at scale.
    *
    * Scale shape: band signatures are the same narrow projection q42
    * and q103 use ([[Similarity2.signBands]] — third consumer, same
    * single copy); the labeled→unlabeled vote join is bucketed (never
    * all-pairs); votes aggregate per (vec, label) with the majority
    * pick under WindowGroupLimit (rank 1 of ≤ 10 label rows); the
    * ground-truth join is by vec_id, co-partitioned with the votes.
    */
  def q110(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label").cast("long"))
    val bands = Similarity2.signBands(emb.select(col("vec_id"), col("embedding")))
    val labeled = bands.join(
      emb.filter(col("vec_id") % 5 =!= 3).select(col("vec_id"), col("label")),
      "vec_id")
    val unlabeled = bands.filter(col("vec_id") % 5 === 3)
    // a (labeled, unlabeled) pair sharing several bands votes ONCE —
    // the shared bucketPairs dedup; the voter's label rides through it
    val votes = Similarity2.bucketPairs(unlabeled, labeled)
      .select(col("va").as("u_id"), col("label"))
      .groupBy(col("u_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val pred = votes
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("u_id"))
          .orderBy(col("n_votes").desc, col("label"))))
      .filter(col("rk") === 1)
      .select(col("u_id").as("vec_id"), col("label").as("pred_label"),
        col("n_votes"))
    pred
      .join(emb.select(col("vec_id"), col("label").as("true_label")), "vec_id")
      .select(col("vec_id"), col("pred_label"), col("n_votes"),
        col("true_label"),
        (col("pred_label") === col("true_label")).as("correct"))
      .orderBy(col("vec_id"))
  }

  val q110Oracle: String =
    s"""WITH sample AS (
       |  SELECT vec_id, embedding FROM embeddings),
       |${Similarity2.bandsCtesSql},
       |lab AS (
       |  SELECT b.vec_id AS l_id, b.band_idx, b.bv,
       |         CAST(e.label AS BIGINT) AS label
       |  FROM bands b JOIN embeddings e ON b.vec_id = e.vec_id
       |  WHERE b.vec_id % 5 <> 3),
       |unl AS (
       |  SELECT vec_id AS u_id, band_idx, bv
       |  FROM bands WHERE vec_id % 5 = 3),
       |votes AS (
       |  SELECT u_id, label, count(*) AS n_votes FROM (
       |    SELECT DISTINCT u.u_id, l.l_id, l.label
       |    FROM unl u JOIN lab l
       |      ON u.band_idx = l.band_idx AND u.bv = l.bv) v
       |  GROUP BY u_id, label),
       |pred AS (
       |  SELECT u_id, label, n_votes,
       |         row_number() OVER (PARTITION BY u_id
       |                            ORDER BY n_votes DESC, label) AS rk
       |  FROM votes)
       |SELECT p.u_id AS vec_id, p.label AS pred_label,
       |       CAST(p.n_votes AS BIGINT) AS n_votes,
       |       CAST(e.label AS BIGINT) AS true_label,
       |       p.label = CAST(e.label AS BIGINT) AS correct
       |FROM pred p JOIN embeddings e ON p.u_id = e.vec_id
       |WHERE p.rk = 1 ORDER BY vec_id""".stripMargin

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

  // ---------------------------------------------------------------- q113

  /** Corpus snapshot diff — the CDC audit every dataset release runs:
    * compare snapshot A (the documents table) against snapshot B (a
    * deterministically derived next release: docs with id % 13 == 0
    * deleted, id % 7 == 0 re-edited, and a batch of new ids appended)
    * by content fingerprint, and report per-status row counts. The
    * fingerprint is the 60-bit content hash, so "changed" means the
    * TEXT changed, not that a row moved or was rewritten in place —
    * the property that makes the diff storage-layout-independent.
    *
    * Scale shape: both sides are narrow scan→project (id, fp); the
    * diff is ONE full-outer join co-partitioned on doc_id (the CDC
    * shape — at 100 TB both snapshots bucket by id and the join is
    * storage-partitioned with no extra shuffle); the report is a
    * partial+final aggregate on a 4-value status domain.
    */
  /** Snapshot A's fingerprint index: (doc_id, fp_a). Shared with the
    * streaming twin ([[graft.streaming.SnapshotDiffStream]]) so both
    * diffs compare the exact same derivation.
    */
  def snapshotA(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), CrossHash.h60(col("text")).as("fp_a"))

  /** The deterministically derived next release as full document rows
    * (doc_id, lang, text) — THE single copy of the derivation rule
    * (%13 delete, %7 ' v2' re-edit, %17 'new:' re-add under a negated
    * id). Every consumer projects from here: [[snapshotB]] (fps, q113/
    * q115), q117 (lengths), q118 (lang+fp), q121 (lang+text) — so the
    * rule can never fork across the release-hygiene family.
    *
    * New ids are negated (-(id)-1) so they can NEVER collide with a
    * real doc_id (ids are non-negative at every scale — an additive
    * offset would collide once the corpus id span exceeds it).
    */
  def snapshotBDocs(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "documents")
    base
      .filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionAll(base.filter(col("doc_id") % 17 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"), col("lang"),
          concat(lit("new:"), col("text")).as("text")))
  }

  /** Snapshot B's fingerprint index: (doc_id, fp_b). Shared with the
    * streaming twin.
    */
  def snapshotB(spark: SparkSession, dir: String): DataFrame =
    snapshotBDocs(spark, dir)
      .select(col("doc_id"), CrossHash.h60(col("text")).as("fp_b"))

  def q113(spark: SparkSession, dir: String): DataFrame = {
    val a = snapshotA(spark, dir)
    val b = snapshotB(spark, dir)
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("status"))
  }

  val q113Oracle: String = {
    val fpA = graft.functions.CrossHash.h60Sql("text")
    val fpB = graft.functions.CrossHash.h60Sql(
      "CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END")
    val fpNew = graft.functions.CrossHash.h60Sql("'new:' || text")
    s"""WITH a AS (
       |  SELECT doc_id, $fpA AS fp_a FROM documents),
       |b AS (
       |  SELECT doc_id, $fpB AS fp_b FROM documents WHERE doc_id % 13 <> 0
       |  UNION ALL
       |  SELECT -doc_id - 1 AS doc_id, $fpNew AS fp_b
       |  FROM documents WHERE doc_id % 17 = 0),
       |d AS (
       |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |         CASE WHEN a.fp_a IS NULL THEN 'added'
       |              WHEN b.fp_b IS NULL THEN 'removed'
       |              WHEN a.fp_a <> b.fp_b THEN 'changed'
       |              ELSE 'unchanged' END AS status
       |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
       |SELECT status, count(*) AS n_docs,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum
       |FROM d GROUP BY status ORDER BY status""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_label_prop" -> (q110 _),
    "q111_kwic_spans" -> (q111 _),
    "q113_snapshot_diff" -> (q113 _))

  val oracles: Map[String, String] = Map(
    "q110_label_prop" -> q110Oracle,
    "q111_kwic_spans" -> q111Oracle,
    "q113_snapshot_diff" -> q113Oracle)
}
