package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash

/** q264: MERGE INTO (upsert) semantics over the CDC frames — the
  * Delta/Iceberg-style `MERGE INTO target USING batch ON key WHEN
  * MATCHED [AND cond] THEN UPDATE/DELETE WHEN NOT MATCHED THEN INSERT`
  * statement, re-expressed as the engine's own logical plan: collapse
  * the batch, one full-outer join, per-clause projection. The q113/
  * q115/q130 trio DIFFS two snapshots; this operator APPLIES a change
  * batch and certifies the merged state.
  *
  * The batch deliberately carries MULTIPLE operations per key
  * (update v1, then update v2, then delete — realistic CDC), which is
  * THE classic MERGE hazard: a lakehouse MERGE aborts on duplicate
  * source matches ("multiple source rows matched"). The deterministic
  * resolution is the [[collapsed]] pre-pass — per key, keep the
  * highest-sequence operation, ties broken by op name ascending — a
  * window over the BATCH only. The op-name tiebreak is LOAD-BEARING,
  * not belt-and-suspenders: a doc_id with %7=0 ∧ %17=3 carries both
  * upd(seq=1) and ins(seq=1), and only the (seq DESC, op ASC) order
  * makes both engines deterministically pick 'ins'. Clause coverage:
  * matched+del → deleted, matched+upd → updated, not-matched+ins →
  * inserted, not-matched+upd/del → noop (the WHEN NOT MATCHED BY
  * SOURCE default keeps the target row: 'kept'). The fixture exercises
  * every clause, including noop: keys the target never had (%17=3)
  * whose winning op is not an insert — %14=0 ∧ %17=3 (upd v2 wins) and
  * %13=0 ∧ %17=3 (del wins). (%7=0 ∧ %17=3 keys are NOT noop — ins
  * wins their seq-1 tie, so they classify as inserted.)
  *
  * Output: per (lang, action) row count, id checksum and a modular
  * fingerprint sum of the SURVIVING state (kept/updated/inserted rows
  * carry their post-merge content hash; deleted/noop contribute NULL)
  * — so the gate certifies not just the action counts but the merged
  * table's content. fp % 1000000007 keeps the sum under n·10⁹
  * (int64-safe below 9·10⁹ docs; raw 60-bit hashes would wrap at ~10⁴
  * rows).
  *
  * Scale shape (the 100 TB re-ingest): the collapse window scans the
  * CHANGE BATCH only — never the target; the merge is ONE full-outer
  * join co-partitioned on the key (the q113 CDC join shape — with the
  * target bucketed on doc_id the re-ingest shuffles only the batch
  * side); clause resolution is a pure projection; the audit aggregate
  * is ≤ |langs|×5 rows. This is exactly the logical plan a
  * transactional MERGE executes before its sink-side file rewrite —
  * the rewrite belongs to the table format (O9's partitioned sink /
  * dynamic partition overwrite), not the query engine.
  */
object MergeOps {

  // the shared cross-engine prime (single copy — oracle interpolates it
  // too, so engine and oracle cannot fork if it is ever tuned)
  private val FpMod = CrossHash.P

  /** Target state: documents minus the %17=3 slice (so the batch's
    * inserts are genuinely absent keys), content-addressed by h60.
    */
  private def target(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .filter(col("doc_id") % 17 =!= 3)
      .select(col("doc_id"), col("lang"), CrossHash.h60(col("text")).as("fp"))

  /** CDC batch with per-key operation HISTORY (seq orders ops):
    * upd v1 (seq 1, %7), upd v2 (seq 2, %14), del (seq 3, %13),
    * ins (seq 1, %17=3 — keys the target excludes).
    */
  private def batch(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("lang"), lit("upd").as("op"), lit(1).as("seq"),
        CrossHash.h60(concat(col("text"), lit(" v1"))).as("fp"))
      .unionAll(d.filter(col("doc_id") % 14 === 0)
        .select(col("doc_id"), col("lang"), lit("upd").as("op"), lit(2).as("seq"),
          CrossHash.h60(concat(col("text"), lit(" v2"))).as("fp")))
      .unionAll(d.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"), col("lang"), lit("del").as("op"), lit(3).as("seq"),
          lit(null).cast("long").as("fp")))
      .unionAll(d.filter(col("doc_id") % 17 === 3)
        .select(col("doc_id"), col("lang"), lit("ins").as("op"), lit(1).as("seq"),
          CrossHash.h60(concat(lit("ins:"), col("text"))).as("fp")))
  }

  /** Duplicate-key resolution: latest seq wins (window over the batch
    * only — the pre-pass that makes MERGE's one-match precondition
    * hold).
    */
  private def collapsed(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("seq").desc, col("op"))
    batch(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("op"), col("fp"))
  }

  def q264(spark: SparkSession, dir: String): DataFrame = {
    val t = target(spark, dir)
      .select(col("doc_id").as("t_id"), col("lang").as("t_lang"),
        col("fp").as("t_fp"))
    val s = collapsed(spark, dir)
      .select(col("doc_id").as("s_id"), col("lang").as("s_lang"),
        col("op"), col("fp").as("s_fp"))
    t.join(s, col("t_id") === col("s_id"), "full_outer")
      .select(
        coalesce(col("t_id"), col("s_id")).as("doc_id"),
        coalesce(col("t_lang"), col("s_lang")).as("lang"),
        when(col("s_id").isNull, "kept")
          .when(col("t_id").isNull && col("op") === "ins", "inserted")
          .when(col("t_id").isNull, "noop")
          .when(col("op") === "del", "deleted")
          .when(col("op") === "upd", "updated")
          .otherwise("noop").as("action"),
        when(col("s_id").isNull, col("t_fp"))
          .when(col("t_id").isNull && col("op") === "ins", col("s_fp"))
          .when(col("t_id").isNotNull && col("op") === "upd", col("s_fp"))
          .as("ffp"))
      .groupBy(col("lang"), col("action"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
        sum(col("ffp") % FpMod).as("fp_sum"))
      .orderBy(col("lang"), col("action"))
  }

  val q264Oracle: String = {
    val fpT = CrossHash.h60Sql("text")
    val fpV1 = CrossHash.h60Sql("text || ' v1'")
    val fpV2 = CrossHash.h60Sql("text || ' v2'")
    val fpIns = CrossHash.h60Sql("'ins:' || text")
    s"""WITH tgt AS (
       |  SELECT doc_id, lang, $fpT AS fp FROM documents WHERE doc_id % 17 <> 3),
       |src0 AS (
       |  SELECT doc_id, lang, 'upd' AS op, 1 AS seq, $fpV1 AS fp
       |  FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id, lang, 'upd', 2, $fpV2 FROM documents WHERE doc_id % 14 = 0
       |  UNION ALL
       |  SELECT doc_id, lang, 'del', 3, CAST(NULL AS BIGINT)
       |  FROM documents WHERE doc_id % 13 = 0
       |  UNION ALL
       |  SELECT doc_id, lang, 'ins', 1, $fpIns
       |  FROM documents WHERE doc_id % 17 = 3),
       |src AS (
       |  SELECT doc_id, lang, op, fp FROM (
       |    SELECT src0.*, row_number() OVER (PARTITION BY doc_id
       |                     ORDER BY seq DESC, op) AS rn FROM src0)
       |  WHERE rn = 1),
       |m AS (
       |  SELECT coalesce(t.doc_id, s.doc_id) AS doc_id,
       |         coalesce(t.lang, s.lang) AS lang,
       |         CASE WHEN s.doc_id IS NULL THEN 'kept'
       |              WHEN t.doc_id IS NULL AND s.op = 'ins' THEN 'inserted'
       |              WHEN t.doc_id IS NULL THEN 'noop'
       |              WHEN s.op = 'del' THEN 'deleted'
       |              WHEN s.op = 'upd' THEN 'updated'
       |              ELSE 'noop' END AS action,
       |         CASE WHEN s.doc_id IS NULL THEN t.fp
       |              WHEN t.doc_id IS NULL AND s.op = 'ins' THEN s.fp
       |              WHEN t.doc_id IS NOT NULL AND s.op = 'upd' THEN s.fp
       |              END AS ffp
       |  FROM tgt t FULL OUTER JOIN src s ON t.doc_id = s.doc_id)
       |SELECT lang, action, count(*) AS n,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       CAST(sum(ffp % $FpMod) AS BIGINT) AS fp_sum
       |FROM m GROUP BY lang, action ORDER BY lang, action""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q264_merge_upsert" -> (q264 _))

  val oracles: Map[String, String] = Map(
    "q264_merge_upsert" -> q264Oracle)
}
