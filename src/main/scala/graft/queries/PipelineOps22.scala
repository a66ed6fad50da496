package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.VectorOps

/** Round-10 pack #10: retrieval diversity and label hygiene — MMR
  * diversified re-ranking (q250) and k-NN label-noise detection (q251).
  */
object PipelineOps22 {

  // ---------------------------------------------------------------- q250

  /** q250 probe panel (≤ 50 probes at any corpus size) and the MMR
    * depths: pool = the candidate shortlist, sel = the diversified set. */
  val MmrPanelMod = 37L
  val MmrPanelMax = 1850L
  val MmrPoolK = 20
  val MmrSelK = 5

  /** q250: MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein
    * 1998) — the diversity-aware selection the fusion family lacks:
    * q163's RRF merges rankings but happily returns five near-copies;
    * MMR greedily picks argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s),
    * trading relevance against redundancy — the dedup principle applied
    * INSIDE a result list (and the same greedy shape a diversity-aware
    * curation sampler uses). With λ = ½ the argmax is invariant under
    * ×2, so the ranking key is the exact integer sim_micro −
    * max_sel_micro over floor-quantized micro-sims (the q204/q211
    * discipline) — the full greedy trace hashes cross-engine. Round 1
    * is the plain top-1; ties break by id.
    *
    * Output: one row per (probe, round) with the picked id, its query
    * sim, and the MMR score it won with — the trace, not just the set,
    * so the gate pins the greedy ORDER.
    *
    * Scale shape: the pool pass is broadcast-panel × corpus (q192's
    * contract, linear in the corpus); everything after — the pool×pool
    * pair sims ([[MmrPoolK]]² per probe) and [[MmrSelK]] greedy rounds —
    * runs on panel-bounded frames (localCheckpoint'ed: each round reads
    * the previous selection, the q218 unrolled-fold discipline; the
    * oracle's round CTEs are MATERIALIZED for the same reason — the
    * q206 lesson).
    */
  def q250(spark: SparkSession, dir: String): DataFrame = {
    val emb64 = table(spark, dir, "embeddings")
      .filter(size(col("embedding")) === 64)
      .select(col("vec_id"), col("embedding"))
    val probes = emb64
      .filter(col("vec_id") % MmrPanelMod === 0 &&
        col("vec_id") < MmrPanelMax)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    val cands = emb64.select(col("vec_id").as("nid"),
      col("embedding").as("ce"))
    val wq = Window.partitionBy(col("pid"))
      .orderBy(col("smq").desc, col("nid"))
    val pool = broadcast(probes).crossJoin(cands)
      .filter(col("nid") =!= col("pid"))
      .select(col("pid"), col("nid"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * 1000000d)
          .cast("long").as("smq"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= MmrPoolK).drop("rn")
      .localCheckpoint()
    val poolEmb = pool.join(
      emb64.select(col("vec_id").as("nid"), col("embedding").as("ne")),
      "nid")
    val ps = poolEmb.as("a")
      .join(poolEmb.as("b"),
        col("a.pid") === col("b.pid") && col("a.nid") =!= col("b.nid"))
      .select(col("a.pid").as("pid"), col("a.nid").as("na"),
        col("b.nid").as("nb"),
        floor(VectorOps.cosineNative(col("a.ne"), col("b.ne")) * 1000000d)
          .cast("long").as("sm"))
      .localCheckpoint()
    var sel = pool.withColumn("rn", row_number().over(wq))
      .filter(col("rn") === 1)
      .select(col("pid"), lit(1L).as("rnd"), col("nid"), col("smq"),
        col("smq").as("score2"))
      .localCheckpoint()
    (2 to MmrSelK).foreach { r =>
      val selIds = sel.select(col("pid"), col("nid"))
      val pen = ps
        .join(selIds.withColumnRenamed("nid", "nb"), Seq("pid", "nb"))
        .groupBy(col("pid"), col("na")).agg(max(col("sm")).as("maxpen"))
        .withColumnRenamed("na", "nid")
      val pick = pool
        .join(selIds, Seq("pid", "nid"), "left_anti")
        .join(pen, Seq("pid", "nid"))
        .withColumn("score2", col("smq") - col("maxpen"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("pid"))
          .orderBy(col("score2").desc, col("nid"))))
        .filter(col("rn") === 1)
        .select(col("pid"), lit(r.toLong).as("rnd"), col("nid"),
          col("smq"), col("score2"))
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.select(col("pid").as("probe_id"), col("rnd"),
        col("nid").as("picked_id"), col("smq").as("sim_micro"),
        col("score2").as("mmr_micro"))
      .orderBy(col("probe_id"), col("rnd"))
  }

  val q250Oracle: String = {
    val rounds = (2 to MmrSelK).map { r =>
      s"""r$r AS (
         |  SELECT p.pid, p.nid, p.smq, p.smq - mx.mp AS score2
         |  FROM pool p
         |  LEFT JOIN sel${r - 1} e ON p.pid = e.pid AND p.nid = e.nid
         |  JOIN (SELECT ps.pid, ps.na, max(ps.sm) AS mp
         |        FROM ps JOIN sel${r - 1} s
         |          ON ps.pid = s.pid AND ps.nb = s.nid
         |        GROUP BY ps.pid, ps.na) mx
         |    ON mx.pid = p.pid AND mx.na = p.nid
         |  WHERE e.nid IS NULL),
         |s$r AS MATERIALIZED (
         |  SELECT pid, CAST($r AS BIGINT) AS rnd, nid, smq, score2
         |  FROM r$r QUALIFY row_number() OVER (PARTITION BY pid
         |      ORDER BY score2 DESC, nid) = 1),
         |sel$r AS MATERIALIZED (
         |  SELECT pid, nid FROM sel${r - 1}
         |  UNION ALL SELECT pid, nid FROM s$r)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to MmrSelK).map(r => s"SELECT * FROM s$r")
      .mkString("\n  UNION ALL ")
    s"""WITH emb64 AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE len(embedding) = 64),
       |pairs AS (
       |  SELECT p.vec_id AS pid, c.vec_id AS nid,
       |         p.embedding AS pe, c.embedding AS ne
       |  FROM emb64 p, emb64 c
       |  WHERE p.vec_id % $MmrPanelMod = 0 AND p.vec_id < $MmrPanelMax
       |    AND c.vec_id <> p.vec_id),
       |${Similarity.cosineCtes("pairs", "sq")},
       |pool AS MATERIALIZED (
       |  SELECT pid, nid, CAST(floor(sim * 1000000) AS BIGINT) AS smq
       |  FROM sq QUALIFY row_number() OVER (PARTITION BY pid
       |      ORDER BY CAST(floor(sim * 1000000) AS BIGINT) DESC, nid)
       |    <= $MmrPoolK),
       |pp AS (
       |  SELECT a.pid, a.nid AS na, b.nid AS nb,
       |         ea.embedding AS pe, eb.embedding AS ne
       |  FROM pool a JOIN pool b ON a.pid = b.pid AND a.nid <> b.nid
       |  JOIN emb64 ea ON a.nid = ea.vec_id
       |  JOIN emb64 eb ON b.nid = eb.vec_id),
       |ppu AS (
       |  SELECT pid, na, nb, CAST(unnest(pe) AS DOUBLE) AS x,
       |         CAST(unnest(ne) AS DOUBLE) AS y
       |  FROM pp),
       |ps AS MATERIALIZED (
       |  SELECT pid, na, nb,
       |         CAST(floor(sum(x * y) / (sqrt(sum(x * x)) *
       |              sqrt(sum(y * y))) * 1000000) AS BIGINT) AS sm
       |  FROM ppu GROUP BY pid, na, nb),
       |s1 AS MATERIALIZED (
       |  SELECT pid, CAST(1 AS BIGINT) AS rnd, nid, smq, smq AS score2
       |  FROM pool QUALIFY row_number() OVER (PARTITION BY pid
       |      ORDER BY smq DESC, nid) = 1),
       |sel1 AS MATERIALIZED (SELECT pid, nid FROM s1),
       |$rounds
       |SELECT pid AS probe_id, rnd, nid AS picked_id, smq AS sim_micro,
       |       score2 AS mmr_micro
       |FROM (
       |  $unionAll)
       |ORDER BY probe_id, rnd""".stripMargin
  }

  // ---------------------------------------------------------------- q251

  /** q251 probe panel (≤ 100 at any corpus size) and the neighborhood
    * size; a probe is SUSPECT when a strict majority of its neighbors
    * disagree with its label. */
  val NoisePanelMod = 41L
  val NoisePanelMax = 4100L
  val NoiseK = 10

  /** q251: LABEL-NOISE detection by k-NN disagreement — the
    * mislabeled-sample screen (the k-NN member of the confident-learning
    * family, cf. Northcutt et al. 2021, arXiv:1911.00068): a vector
    * whose nearest neighbors mostly carry a DIFFERENT label is either
    * mislabeled or sits on a class boundary; both are exactly what a
    * training-data audit pulls for review. Per label: probe count, mean
    * neighborhood-disagreement permille, and the suspect count
    * (disagreement > k/2) — the item-level twin of q239's cluster-level
    * purity (purity says "cluster 7 is 80% label 3"; this names the
    * vectors to re-check). Ranking on floor-quantized micro-sims with
    * id tie-breaks; all reported numbers integer.
    *
    * Scale shape: broadcast fixed panel × corpus, one narrow codegen'd
    * pass ranked under a literal row_number bound (q192's contract —
    * linear in the corpus; an IVF shortlist (q94) slots in when the
    * panel scales). Aggregates land on the label domain.
    */
  def q251(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .filter(size(col("embedding")) === 64)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
    val probes = emb
      .filter(col("vec_id") % NoisePanelMod === 0 &&
        col("vec_id") < NoisePanelMax)
      .select(col("vec_id").as("pid"), col("label").as("plabel"),
        col("embedding").as("pe"))
    val cands = emb.select(col("vec_id").as("nid"),
      col("label").as("nlabel"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("sm").desc, col("nid"))
    broadcast(probes).crossJoin(cands)
      .filter(col("nid") =!= col("pid"))
      .select(col("pid"), col("plabel"), col("nlabel"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * 1000000d)
          .cast("long").as("sm"), col("nid"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= NoiseK)
      .groupBy(col("pid"), col("plabel"))
      .agg(sum(when(col("nlabel") =!= col("plabel"), 1L).otherwise(0L))
        .as("nd"))
      .groupBy(col("plabel"))
      .agg(
        count(lit(1)).as("n_probes"),
        expr(s"(1000 * sum(nd)) div ($NoiseK * count(1))")
          .as("mean_disagree_permille"),
        sum(when(col("nd") * 2 > NoiseK, 1L).otherwise(0L))
          .as("n_suspect"))
      .select(col("plabel").as("label"), col("n_probes"),
        col("mean_disagree_permille"), col("n_suspect"))
      .orderBy(col("label"))
  }

  val q251Oracle: String =
    s"""WITH emb64 AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding
       |  FROM embeddings WHERE len(embedding) = 64),
       |pairs AS (
       |  SELECT p.vec_id AS pid, c.vec_id AS nid,
       |         p.embedding AS pe, c.embedding AS ne
       |  FROM emb64 p, emb64 c
       |  WHERE p.vec_id % $NoisePanelMod = 0 AND p.vec_id < $NoisePanelMax
       |    AND c.vec_id <> p.vec_id),
       |${Similarity.cosineCtes("pairs", "sq")},
       |lab AS (SELECT vec_id, label FROM emb64),
       |ranked AS (
       |  SELECT s.pid, pl.label AS plabel, nl.label AS nlabel,
       |         row_number() OVER (PARTITION BY s.pid
       |             ORDER BY CAST(floor(sim * 1000000) AS BIGINT) DESC,
       |                      s.nid) AS rn
       |  FROM sq s JOIN lab pl ON s.pid = pl.vec_id
       |  JOIN lab nl ON s.nid = nl.vec_id),
       |per AS (
       |  SELECT pid, plabel,
       |         CAST(sum(CASE WHEN nlabel <> plabel THEN 1 ELSE 0 END)
       |              AS BIGINT) AS nd
       |  FROM ranked WHERE rn <= $NoiseK GROUP BY pid, plabel)
       |SELECT plabel AS label, count(*) AS n_probes,
       |       (1000 * CAST(sum(nd) AS BIGINT)) // ($NoiseK * count(*))
       |         AS mean_disagree_permille,
       |       CAST(sum(CASE WHEN nd * 2 > $NoiseK THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_suspect
       |FROM per GROUP BY plabel ORDER BY label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q250_mmr_rerank" -> (q250 _),
    "q251_label_noise" -> (q251 _))

  val oracles: Map[String, String] = Map(
    "q250_mmr_rerank" -> q250Oracle,
    "q251_label_noise" -> q251Oracle)
}
