package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.VectorOps

/** q42-q43: embedding-cosine near-dup detection and the cross-modal
  * (documents ⋈ embeddings) join surface.
  */
object Similarity2 {

  // ---------------------------------------------------------------- q42

  /** Embedding-cosine near-dup detection: for each vector in a
    * deterministic 1/4 sample, its nearest neighbor within the sample and
    * a duplicate flag at cosine ≥ 0.3. Output is one row per sample
    * vector (never empty), so the operator's shape is scale-stable; at
    * 100 TB the all-pairs leg is replaced by sign-LSH bucketing (random
    * hyperplanes) with this exact scoring as the in-bucket verifier.
    */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val sample = table(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0)
    val a = sample.select(col("vec_id").as("vec_id"), col("embedding").as("ea"))
    val b = sample.select(col("vec_id").as("nn_id"), col("embedding").as("eb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("nn_id"))
    a.crossJoin(b)
      .filter(col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"),
        round(VectorOps.cosineNative(col("ea"), col("eb")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("nn_id"), col("sim"),
        (col("sim") >= 0.3).as("is_near_dup"))
      .orderBy(col("vec_id"))
  }

  val q42Oracle: String =
    """WITH sample AS (
      |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0),
      |pairs AS (
      |  SELECT a.vec_id AS pid, b.vec_id AS nid,
      |         a.embedding AS pe, b.embedding AS ne
      |  FROM sample a, sample b WHERE a.vec_id <> b.vec_id),
      |un AS (
      |  SELECT pid, nid, CAST(unnest(pe) AS DOUBLE) AS x,
      |         CAST(unnest(ne) AS DOUBLE) AS y
      |  FROM pairs),
      |sims AS (
      |  SELECT pid, nid,
      |         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6)
      |           AS sim
      |  FROM un GROUP BY pid, nid),
      |nn AS (
      |  SELECT pid, nid, sim,
      |         row_number() OVER (PARTITION BY pid
      |                            ORDER BY sim DESC, nid) AS rn
      |  FROM sims)
      |SELECT pid AS vec_id, nid AS nn_id, sim, sim >= 0.3 AS is_near_dup
      |FROM nn WHERE rn = 1 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q43

  /** Cross-modal join: text features and vector features of the same
    * corpus item combined in one pass — documents ⋈ embeddings on id,
    * rolled up per (lang, label). The join key is the corpus id, so both
    * modalities co-partition; at scale this is a bucketed or
    * storage-partitioned join with zero extra shuffle.
    */
  def q43(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .join(table(spark, dir, "embeddings"),
        col("doc_id") === col("vec_id"))
      .select(col("lang"), col("label"),
        col("n_chars"),
        VectorOps.l2Norm(col("embedding")).as("norm"))
      .groupBy(col("lang"), col("label"))
      .agg(
        count(lit(1)).as("n_items"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        round(avg(col("norm")), 4).as("avg_norm"))
      .orderBy(col("lang"), col("label"))

  val q43Oracle: String =
    """WITH un AS (
      |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |norms AS (
      |  SELECT vec_id, label, sqrt(sum(x * x)) AS norm
      |  FROM un GROUP BY vec_id, label)
      |SELECT d.lang, n.label,
      |       count(*) AS n_items,
      |       round(avg(d.n_chars), 2) AS avg_chars,
      |       round(avg(n.norm), 4) AS avg_norm
      |FROM documents d JOIN norms n ON d.doc_id = n.vec_id
      |GROUP BY d.lang, n.label ORDER BY d.lang, n.label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_embedding_neardup" -> (q42 _),
    "q43_crossmodal_join" -> (q43 _))

  val oracles: Map[String, String] = Map(
    "q42_embedding_neardup" -> q42Oracle,
    "q43_crossmodal_join" -> q43Oracle)
}
