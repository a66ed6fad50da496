package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.{CrossHash, VectorOps}

/** Round-10 pack #6: the embedding-pipeline shapes that close the
  * representation-learning loop — Johnson–Lindenstrauss random
  * projection with a measured distortion audit (q237), hard-negative
  * mining for contrastive training (q238), and label purity of the
  * trained clustering (q239, the semantic twin of q233's geometric
  * silhouette).
  */
object EmbeddingOps {

  // ---------------------------------------------------------------- q237

  /** Input / output dimensionality of the JL projection. */
  val JlInDim = 64
  val JlOutDim = 16

  /** Distortion-audit panel bound (fixed-size panel, the q103 rule). */
  val JlPanelMax = 40L

  /** In-band window: a pair is "JL-preserved" when its distortion
    * permille lies within ±20% of the expectation 1000. */
  val JlBandLo = 800L
  val JlBandHi = 1200L

  /** The deterministic ±1 sign matrix, signs(j)(d−1) for output dim j
    * and input dim d — derived from the shared md5-h60 so the oracle
    * regenerates the identical matrix in SQL ([[CrossHash.h60Sql]]
    * contract: both engines read the same first 60 md5 bits).
    */
  private[graft] lazy val jlSigns: Array[Array[Long]] =
    Array.tabulate(JlOutDim) { j =>
      Array.tabulate(JlInDim) { d0 =>
        val d = d0 + 1
        val h = CrossHash.h60FromDigest(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"jl:$d:$j".getBytes("UTF-8")))
        if (h % 2 == 0) 1L else -1L
      }
    }

  /** q237: JOHNSON–LINDENSTRAUSS random projection (64 → 16 dims via a
    * deterministic ±1 sign matrix — Achlioptas 2001's database-friendly
    * variant) with its distortion AUDIT: for every pair of a fixed
    * panel, the ratio of projected to original squared distance
    * (E[‖Px‖²] = k·‖x‖² for ±1 entries, so distortion ≡ d²_proj /
    * (k·d²_orig) ≈ 1). Dimensionality reduction is how a 100 TB
    * embedding column drops 4× in size before ANN indexing; this query
    * is both the projector and the evidence the distances survived it.
    * Everything is exact int64 (quantized inputs, integer sign folds),
    * so the hash gate certifies projector AND audit; the sign matrix
    * derives from the shared md5-h60 literal contract, never an RNG.
    *
    * Scale shape: the projection is a pure narrow in-projection fold
    * (16 codegen'd sums per row — at scale this is the map stage of an
    * export); the audit pairs are panel×panel (≤ [[JlPanelMax]]²/2,
    * constant at any corpus size). Int64 budget: |y_j| ≤ 64·10⁴ ⇒ pair
    * term ≤ 6.5·10¹²·16 ≈ 10¹⁴; ×1000 ≪ 2⁶³.
    */
  def q237(spark: SparkSession, dir: String): DataFrame = {
    val q = table(spark, dir, "embeddings")
      .filter(size(col("embedding")) === JlInDim &&
        col("vec_id") < JlPanelMax)
      .select(col("vec_id"),
        VectorOps.quantize(col("embedding"), ReleaseOps.EmbQScale).as("qv"))
    val proj = q.select(col("vec_id"), col("qv"),
      array((0 until JlOutDim).map { j =>
        expr(s"aggregate(zip_with(qv, array(${jlSigns(j).mkString(",")}), " +
          "(x, s) -> x * s), cast(0 as bigint), (a, e) -> a + e)")
      }: _*).as("y"))
    val pairs = proj.select(col("vec_id").as("va"), col("qv").as("qa"),
        col("y").as("ya"))
      .crossJoin(broadcast(proj.select(col("vec_id").as("vb"),
        col("qv").as("qb"), col("y").as("yb"))))
      .filter(col("va") < col("vb"))
      .select(
        VectorOps.intSqDist(col("qa"), col("qb")).as("d2o"),
        VectorOps.intSqDist(col("ya"), col("yb")).as("d2p"))
      .select(
        expr(s"coalesce((1000 * d2p) div nullif($JlOutDim * d2o, 0), 1000)")
          .as("dist_pm"))
    pairs.agg(
        count(lit(1)).as("n_pairs"),
        expr("sum(dist_pm) div count(1)").as("mean_dist_permille"),
        min(col("dist_pm")).as("min_dist_permille"),
        max(col("dist_pm")).as("max_dist_permille"),
        sum(when(col("dist_pm").between(JlBandLo, JlBandHi), 1L)
          .otherwise(0L)).as("n_in_band"))
      .withColumn("in_band_permille", expr("(1000 * n_in_band) div n_pairs"))
      .orderBy(col("n_pairs"))
  }

  val q237Oracle: String = {
    val h = CrossHash.h60Sql(
      "'jl:' || CAST(d AS VARCHAR) || ':' || CAST(j AS VARCHAR)")
    s"""WITH sgn AS (
       |  SELECT d, j, CASE WHEN $h % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(range(1, ${JlInDim + 1})) AS d) dd
       |  CROSS JOIN (SELECT unnest(range(0, $JlOutDim)) AS j) jj),
       |q AS (
       |  SELECT vec_id,
       |         list_transform(embedding, e ->
       |           CAST(floor(CAST(e AS DOUBLE) * ${ReleaseOps.EmbQScale})
       |                AS BIGINT)) AS qv
       |  FROM embeddings
       |  WHERE len(embedding) = $JlInDim AND vec_id < $JlPanelMax),
       |proj AS (
       |  SELECT vec_id, j, CAST(sum(s * qv[d]) AS BIGINT) AS y
       |  FROM q CROSS JOIN sgn GROUP BY vec_id, j),
       |po AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb,
       |         CAST(list_sum(list_transform(range(1, ${JlInDim + 1}),
       |             i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
       |           AS BIGINT) AS d2o
       |  FROM q a JOIN q b ON a.vec_id < b.vec_id),
       |pp AS (
       |  SELECT pa.vec_id AS va, pb.vec_id AS vb,
       |         CAST(sum((pa.y - pb.y) * (pa.y - pb.y)) AS BIGINT) AS d2p
       |  FROM proj pa JOIN proj pb ON pa.j = pb.j AND pa.vec_id < pb.vec_id
       |  GROUP BY 1, 2),
       |d AS (
       |  SELECT COALESCE((1000 * d2p) // nullif($JlOutDim * d2o, 0), 1000)
       |           AS dist_pm
       |  FROM po JOIN pp ON po.va = pp.va AND po.vb = pp.vb)
       |SELECT count(*) AS n_pairs,
       |       CAST(CAST(sum(dist_pm) AS BIGINT) // count(*) AS BIGINT)
       |         AS mean_dist_permille,
       |       min(dist_pm) AS min_dist_permille,
       |       max(dist_pm) AS max_dist_permille,
       |       CAST(sum(CASE WHEN dist_pm BETWEEN $JlBandLo AND $JlBandHi
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band,
       |       (1000 * CAST(sum(CASE WHEN dist_pm BETWEEN $JlBandLo AND $JlBandHi
       |                             THEN 1 ELSE 0 END) AS BIGINT))
       |         // count(*) AS in_band_permille
       |FROM d ORDER BY n_pairs""".stripMargin
  }

  // ---------------------------------------------------------------- q238

  /** Hard negatives reported per probe. */
  val HardNegK = 5

  /** q238: INDEX-ACCELERATED hard-negative mining — the IVF scale path
    * of q192's exhaustive miner (the q19 → q94 relationship, applied to
    * negative mining): q192 prices every anchor against the WHOLE
    * corpus (O(panel × corpus)); here candidates are the probe's
    * trained cluster only, so per-probe cost is the ~200-vector
    * expected cluster size at ANY corpus scale. The trade is the
    * standard IVF one — a true hard negative assigned to another
    * cluster is missed — which is exactly what the eval family
    * (q103 recall, q211 nprobe curve, q224 MRR) measures for this
    * index. Composes the memoized q94 clustering with the codegen'd
    * cosine; ranking on floor-quantized micro-sims with id tie-breaks
    * (the q211/q224 discipline), so the hash gate certifies the miner
    * end-to-end.
    */
  def q238(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Similarity.kmClusters(spark, dir)
    val labels = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val withLab = clusters.join(labels, Seq("vec_id"))
    val probes = withLab.filter(col("vec_id").between(20, 29))
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("embedding").as("pe"), col("cluster").as("pcluster"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim_micro").desc, col("neighbor_id"))
    probes
      .join(withLab.as("c"),
        col("pcluster") === col("c.cluster") &&
        col("c.vec_id") =!= col("probe_id") &&
        col("c.label") =!= col("probe_label"))
      .select(col("probe_id"), col("probe_label"),
        col("c.vec_id").as("neighbor_id"), col("c.label").as("neighbor_label"),
        floor(VectorOps.cosineNative(col("pe"), col("c.embedding")) * 1000000d)
          .cast("long").as("sim_micro"))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= HardNegK)
      .orderBy(col("probe_id"), col("rnk"))
      .select(col("probe_id"), col("probe_label"), col("rnk"),
        col("neighbor_id"), col("neighbor_label"), col("sim_micro"))
  }

  val q238Oracle: String =
    s"""WITH ${Similarity.kmAssignCtes},
       |lab AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding
       |  FROM embeddings),
       |probes AS (
       |  SELECT a.vec_id AS probe_id, l.label AS p_label,
       |         l.embedding AS pe, a.cluster
       |  FROM asgF a JOIN lab l ON l.vec_id = a.vec_id
       |  WHERE a.vec_id BETWEEN 20 AND 29),
       |cands AS (
       |  SELECT p.probe_id AS pid, p.p_label, a.vec_id AS nid,
       |         l.label AS n_label, p.pe AS pe, l.embedding AS ne
       |  FROM probes p
       |  JOIN asgF a ON a.cluster = p.cluster AND a.vec_id <> p.probe_id
       |  JOIN lab l ON l.vec_id = a.vec_id
       |  WHERE l.label <> p.p_label),
       |${Similarity.cosineCtes("cands", "hsims")},
       |ranked AS (
       |  SELECT c.pid, c.p_label, c.nid, c.n_label,
       |         CAST(floor(s.sim * 1000000) AS BIGINT) AS sim_micro,
       |         row_number() OVER (PARTITION BY c.pid
       |           ORDER BY CAST(floor(s.sim * 1000000) AS BIGINT) DESC, c.nid)
       |           AS rnk
       |  FROM cands c JOIN hsims s ON s.pid = c.pid AND s.nid = c.nid)
       |SELECT pid AS probe_id, p_label AS probe_label,
       |       CAST(rnk AS BIGINT) AS rnk, nid AS neighbor_id,
       |       n_label AS neighbor_label, sim_micro
       |FROM ranked WHERE rnk <= $HardNegK
       |ORDER BY probe_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q239

  /** q239: LABEL PURITY of the trained clustering — the semantic
    * cluster-quality readout beside q233's geometric silhouette: per
    * cluster, the majority label's share. A high-silhouette clustering
    * with low purity means the embedding geometry does not encode the
    * labels — the readout that decides whether cluster-based curation
    * (SemDeDup q170, cluster-balanced sampling) can be trusted to
    * respect semantics. Majority = highest count, ties to the lower
    * label (total order, rerun-stable); purity in exact integer
    * permille.
    *
    * Scale shape: one pass over the memoized assignment joined to the
    * corpus-sized label projection, reduced to the (cluster × label)
    * frame; windows run on that bounded frame, never the corpus.
    */
  def q239(spark: SparkSession, dir: String): DataFrame = {
    val cl = Similarity.kmClusters(spark, dir)
      .select(col("vec_id"), col("cluster"))
      .join(table(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label")),
        Seq("vec_id"))
    val cnt = cl.groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
    val wC = Window.partitionBy(col("cluster"))
    cnt
      .withColumn("n", sum(col("c")).over(wC))
      .withColumn("rn", row_number().over(
        wC.orderBy(col("c").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("cluster").cast("long").as("cluster"),
        col("n").as("n_vecs"), col("label").as("maj_label"),
        col("c").as("maj_c"),
        expr("(1000 * c) div n").as("purity_permille"))
      .orderBy(col("cluster"))
  }

  val q239Oracle: String =
    s"""WITH ${Similarity.kmAssignCtes},
       |cl AS (
       |  SELECT a.cluster, CAST(e.label AS BIGINT) AS label
       |  FROM asgF a JOIN embeddings e ON e.vec_id = a.vec_id),
       |cnt AS (SELECT cluster, label, count(*) AS c FROM cl GROUP BY 1, 2),
       |top AS (
       |  SELECT cluster, label, c,
       |         CAST(sum(c) OVER (PARTITION BY cluster) AS BIGINT) AS n,
       |         row_number() OVER (PARTITION BY cluster
       |                            ORDER BY c DESC, label) AS rn
       |  FROM cnt)
       |SELECT CAST(cluster AS BIGINT) AS cluster, n AS n_vecs,
       |       label AS maj_label, c AS maj_c,
       |       (1000 * c) // n AS purity_permille
       |FROM top WHERE rn = 1 ORDER BY cluster""".stripMargin

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q237_jl_projection" -> (q237 _),
    "q238_hard_negatives" -> (q238 _),
    "q239_cluster_purity" -> (q239 _),
    "q110_label_prop" -> (q110 _))

  val oracles: Map[String, String] = Map(
    "q237_jl_projection" -> q237Oracle,
    "q238_hard_negatives" -> q238Oracle,
    "q239_cluster_purity" -> q239Oracle,
    "q110_label_prop" -> q110Oracle)
}
