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
    // OPTIMIZATION r16 (guide §2.4): the labeled and unlabeled branches
    // both derive from the sign-LSH index, whose subtree is the corpus
    // dot-product pass — checkpointed, it is computed once and both
    // branches (and their join) read the materialized blocks, exactly
    // how a production system persists an LSH index before probing it.
    // DEVIATION NOTE (ADVICE r16): unlike the other r16 checkpoints this
    // frame is corpus-PROPORTIONAL, so the localCheckpoint trade
    // (unreplicated blocks, truncated lineage — executor loss kills the
    // job; local disks hold a corpus-sized intermediate) applies at
    // cluster scale. A pipeline embedding this shape should persist
    // (MEMORY_AND_DISK, recomputable lineage) or reliably checkpoint()
    // the index at this exact plan point — the q183Basket(Persist) seam
    // in Relational16 documents the pattern. The gate query keeps the
    // localCheckpoint: a plan-keyed persist would be silently shared
    // across bench iterations (warm medians would measure the cache,
    // not the query — the Relational16 CacheManager note).
    val bands = Similarity2.signBands(
      emb.select(col("vec_id"), col("embedding")),
      Similarity2.bitsPerBand(spark, dir))
      .localCheckpoint()
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

  // ---------------------------------------------------------------- q233

  /** Evaluation panel bound for the silhouette: the audit scores the
    * vectors with vec_id below this (fixed once the corpus outgrows
    * it). Without the panel the pass is n·k distances with k = n/200
    * adaptive ⇒ O(n²/200) — measured 9.8× wall at 10× data before the
    * cap (the round-6 "fixed-size evaluation panels, never a corpus
    * fraction" rule, re-learned). With it: panel·k = 10·n, linear.
    */
  val SilPanelMax = 2000L

  /** q233: SIMPLIFIED SILHOUETTE of the trained IVF clustering — the
    * cluster-quality readout the ANN eval family (q103 recall, q211
    * nprobe curve, q224 MRR) lacks: those grade SEARCH against the
    * index; this grades the index's own geometry. Full silhouette is
    * O(n²) (mean pairwise distances); the simplified form (Hruschka
    * 2004) replaces point-to-cluster means with point-to-CENTROID
    * distances — a(i) = d²(i, own centroid), b(i) = min d²(i, other
    * centroid), s = (b−a)/max(a,b) — which is O(n·k), the same cost as
    * one Lloyd assignment round. All arithmetic is the trainer's own
    * exact int64 discipline (floor(x·10⁴) quantization, the settled
    * codebook the final assignment ran against), so s_permille is a
    * BIGINT identical across engines and the hash gate certifies the
    * evaluation itself. The score sits in [−1000, 1000]; max(a,b)=0 (a
    * vector ON two coincident centroids) reports 0. Under the two-level
    * trainer the assignment
    * is CELL-LOCAL (a vector joins the best fine centroid of its own
    * coarse cell — the IVF contract), so a(i) is the argmin within the
    * cell, not globally: another cell's centroid can sit closer and
    * s goes negative — which is exactly what the silhouette is FOR
    * (boundary vectors score the cut quality). Both engines truncate
    * the integer division toward zero (Spark `div` ≡ DuckDB `//` on
    * negatives — spec-pinned), so the permille stays hash-exact.
    *
    * Scale shape: the [[SilPanelMax]]-bounded evaluation panel
    * BROADCASTS and the corpus-proportional codebook (k rows, k =
    * n div 200 by the adaptive rule) STREAMS — never the reverse: at
    * 10⁹ vectors the codebook is a 5M-row frame, over broadcast
    * limits. Panel×k distances stay linear in n where a full pass
    * would be O(n²/200) under the adaptive k; each of the k distances
    * folds to an int64 in-projection and everything after lands on
    * the ≤-panel-sized cluster frame. Int64 budget: per-pair d² ≤
    * 64·(2·10⁴)² ≈ 2.6·10¹⁰, panel sums ≪ 2⁶³.
    * Dimensionality contract: like every consumer of the q94
    * trained index (q158/q170/q211/q224/q238/q239), this assumes the
    * uniform-dim embeddings the trainer itself requires — a ragged
    * corpus is outside the family contract (q228/q237, which scan the
    * raw table, filter dims explicitly).
    */
  def q233(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Similarity.kmClusters(spark, dir)
      .filter(col("vec_id") < SilPanelMax)
      .select(col("vec_id"), col("cluster"),
        graft.functions.VectorOps
          .quantize(col("embedding"), Similarity.KmScale).as("qv"))
    // the codebook frame arrives AQE-coalesced (k rows ≪ a shuffle
    // partition), which would stream the whole panel×k pass through ONE
    // task (measured 43 s at the sf10 rung); re-spreading the k-row
    // frame is a trivial shuffle and restores the parallelism
    val cents = Similarity.kmCentroids(spark, dir)
      .repartition(col("cent_id"))
    broadcast(clusters).crossJoin(cents)
      .select(col("vec_id"), col("cluster"), col("cent_id"),
        graft.functions.VectorOps.intSqDist(col("qv"), col("cq")).as("d2"))
      .groupBy(col("vec_id"), col("cluster"))
      .agg(
        min(when(col("cent_id") === col("cluster"), col("d2"))).as("a2"),
        min(when(col("cent_id") =!= col("cluster"), col("d2"))).as("b2"))
      .select(col("cluster"),
        expr("coalesce((1000 * (b2 - a2)) div nullif(greatest(a2, b2), 0), 0)")
          .as("s_pm"),
        col("a2"), col("b2"))
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(
        count(lit(1)).as("n_vecs"),
        expr("sum(s_pm) div count(1)").as("mean_sil_permille"),
        min(col("s_pm")).as("min_sil_permille"),
        expr("sum(a2) div count(1)").as("mean_a2"),
        expr("sum(b2) div count(1)").as("mean_b2"))
      .orderBy(col("cluster"))
  }

  val q233Oracle: String =
    s"""WITH ${Similarity.kmAssignCtes},
       |aP AS (
       |  -- panel-to-EVERY-centroid distances against the settled global
       |  -- codebook (the Spark side's broadcast(panel) × codebook pass)
       |  SELECT eq.vec_id, c.cent_id,
       |         sum((eq.x - c.x) * (eq.x - c.x)) AS dist
       |  FROM eq JOIN cbF c ON eq.d = c.d
       |  WHERE eq.vec_id < $SilPanelMax
       |  GROUP BY eq.vec_id, c.cent_id),
       |ab AS (
       |  SELECT f.vec_id, g.cluster,
       |         min(CASE WHEN f.cent_id = g.cluster THEN f.dist END) AS a2,
       |         min(CASE WHEN f.cent_id <> g.cluster THEN f.dist END) AS b2
       |  FROM aP f JOIN asgF g ON f.vec_id = g.vec_id
       |  GROUP BY f.vec_id, g.cluster),
       |s AS (
       |  SELECT cluster, CAST(a2 AS BIGINT) AS a2, CAST(b2 AS BIGINT) AS b2,
       |         COALESCE((1000 * (CAST(b2 AS BIGINT) - CAST(a2 AS BIGINT)))
       |           // nullif(greatest(CAST(a2 AS BIGINT), CAST(b2 AS BIGINT)), 0),
       |           0) AS s_pm
       |  FROM ab)
       |SELECT CAST(cluster AS BIGINT) AS cluster, count(*) AS n_vecs,
       |       CAST(CAST(sum(s_pm) AS BIGINT) // count(*) AS BIGINT)
       |         AS mean_sil_permille,
       |       CAST(min(s_pm) AS BIGINT) AS min_sil_permille,
       |       CAST(CAST(sum(a2) AS BIGINT) // count(*) AS BIGINT) AS mean_a2,
       |       CAST(CAST(sum(b2) AS BIGINT) // count(*) AS BIGINT) AS mean_b2
       |FROM s GROUP BY cluster ORDER BY cluster""".stripMargin

  // ---------------------------------------------------------------- q219

  /** Power-iteration rounds. Fixed and small so the oracle stays an
    * unrolled CTE chain (the q206/q218 discipline). */
  val PcaIterations = 12

  /** Fixed-point scale of the eigenvector (2^16). With the covariance
    * capped below 2^20 (see shift), a matvec is ≤ 2^20·2^16·64 = 2^42
    * and the renorm numerator ≤ 2^58 — inside int64. */
  val PcaVScale = 65536L

  /** q219: the principal component of the embedding cloud by POWER
    * ITERATION — distributed PCA in its production shape (Spark MLlib's
    * own PCA does exactly this split): the corpus-scale work is ONE
    * pass building the 64×64 Gram/covariance matrix; the eigensolve
    * then runs on that fixed-size matrix, far below driver scale. All
    * arithmetic is integer: embeddings quantize by floor(x·128)
    * (power-of-two multiply — exact in any float width), the centered
    * covariance is C = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ (exact int64 for n < 2^24),
    * C is right-shifted to < 2^20 via the bit-length identity
    * (length(bin(x)) − 1 = floor(log2 x), the q167 trick), and each of
    * the [[PcaIterations]] matvec+renorm rounds is truncated int64
    * division — so Spark (driver Scala on the collected 4096-entry
    * matrix, the KMeans-codebook class of bounded data) and DuckDB
    * (unrolled CTEs) agree BIT-FOR-BIT and the hash gate certifies the
    * eigensolver itself. Sign is canonicalized by making the
    * largest-|component| dimension positive (tie → lowest dim).
    *
    * Scale shape: ONE corpus pass through the one-buffer
    * [[graft.functions.GramianAggregator]] UDAF — each row's 64×64
    * outer product is folded into a flat per-partition long array by a
    * tight loop (no 4,161 per-row struct materializations, no explode,
    * no per-cell shuffle rows; the round-10 explode formulation burned
    * exactly that constant and was the suite's slowest query), and the
    * partial aggregate ships 2+d+d² longs per partition. One bounded
    * collect (the KMeans-codebook class) then carries the matrix, the
    * dim sums AND n in a single row, so n is count(*) over ALL rows —
    * including NULL/ragged embeddings, which contribute only their n
    * increment — exactly the oracle's `nn` CTE.
    */
  def q219(spark: SparkSession, dir: String): DataFrame = {
    val q = table(spark, dir, "embeddings")
      .select(coalesce(
        expr("transform(embedding, e -> cast(floor(cast(e as double) * 128) as bigint))"),
        expr("array()").cast("array<bigint>")).as("q"))
    val gram = udaf(new graft.functions.GramianAggregator)

    // one bounded collect: a single [n, dims, s…, gram…] summary row
    val g = q.agg(gram(col("q")).as("g"))
      .head().getAs[Seq[Long]]("g").toArray
    val n = g(0)
    val dims = g(1).toInt
    val s = Array.tabulate(dims)(i => g(2 + i))
    val c = Array.tabulate(dims, dims)((i, j) =>
      n * g(2 + dims + i * dims + j) - s(i) * s(j))
    val maxAbs = c.flatten.map(math.abs).foldLeft(0L)(math.max)
    val shift = math.max(0, java.lang.Long.toBinaryString(maxAbs).length - 20)
    val cm = c.map(_.map(_ / (1L << shift)))

    var v = Array.fill(dims)(PcaVScale)
    for (_ <- 1 to PcaIterations) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cm(i)(j) * v(j)).sum)
      val m = w.map(math.abs).foldLeft(0L)(math.max)
      v = if (m == 0L) w else w.map(x => x * PcaVScale / m)
    }
    // empty corpus → empty frame (the oracle's LIMIT-1 pick vanishes too)
    val signed =
      if (dims == 0) Array.empty[Long]
      else {
        val top = (0 until dims).minBy(d => (-math.abs(v(d)), d))
        if (v(top) < 0L) v.map(-_) else v
      }

    import spark.implicits._
    signed.zipWithIndex.map { case (comp, d) => (d.toLong, comp) }.toSeq
      .toDF("dim", "component").orderBy(col("dim"))
  }

  val q219Oracle: String = {
    val iters = (1 to PcaIterations).map { k =>
      s"""w$k AS MATERIALIZED (
         |  SELECT c.i, CAST(sum(c.c * v.v) AS BIGINT) AS w
         |  FROM cm c JOIN v${k - 1} v ON v.i = c.j GROUP BY c.i),
         |v$k AS MATERIALIZED (
         |  SELECT i, CAST(coalesce(
         |    w * $PcaVScale // nullif((SELECT max(abs(w)) FROM w$k), 0),
         |    w) AS BIGINT) AS v
         |  FROM w$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(embedding, e ->
       |           CAST(floor(CAST(e AS DOUBLE) * 128) AS BIGINT)) AS q
       |  FROM embeddings),
       |el AS MATERIALIZED (
       |  SELECT vec_id, unnest(q) AS qi,
       |         generate_subscripts(q, 1) AS i
       |  FROM q),
       |nn AS (SELECT count(*) AS n FROM q),
       |s AS MATERIALIZED (
       |  SELECT i, CAST(sum(qi) AS BIGINT) AS s FROM el GROUP BY i),
       |g AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, CAST(sum(a.qi * b.qi) AS BIGINT) AS sij
       |  FROM el a JOIN el b USING (vec_id) GROUP BY 1, 2),
       |c AS MATERIALIZED (
       |  SELECT g.i, g.j,
       |         (SELECT n FROM nn) * sij - sa.s * sb.s AS c
       |  FROM g JOIN s sa ON sa.i = g.i JOIN s sb ON sb.i = g.j),
       |sh AS (
       |  SELECT greatest(0, length(bin(max(abs(c)))) - 20) AS sh FROM c),
       |cm AS MATERIALIZED (
       |  SELECT i, j, c // (CAST(1 AS BIGINT) << (SELECT sh FROM sh)) AS c
       |  FROM c),
       |v0 AS (SELECT DISTINCT i, CAST($PcaVScale AS BIGINT) AS v FROM cm),
       |$iters,
       |pick AS (
       |  SELECT v AS vtop FROM v$PcaIterations ORDER BY abs(v) DESC, i LIMIT 1)
       |SELECT CAST(v.i - 1 AS BIGINT) AS dim,
       |       CAST(CASE WHEN p.vtop < 0 THEN -v.v ELSE v.v END AS BIGINT)
       |         AS component
       |FROM v$PcaIterations v CROSS JOIN pick p
       |ORDER BY dim""".stripMargin
  }

  // ---------------------------------------------------------------- q103

  /** Recall@k evaluation of the q42 sign-LSH index: for a probe subset,
    * compare the index's candidate set (band-bucket collisions, via the
    * SAME [[Similarity2.signBands]] the index itself uses) against the
    * exact cosine top-[[RecallK]] over the sample, and report per-probe
    * candidate count, hit count, and integer recall percent. An ANN
    * index you cannot grade is an ANN index you cannot tune — this is
    * the harness that turns q42's band parameters into a measured
    * recall/cost trade.
    *
    * Scale shape: the exact side is the EVALUATION, not the serving
    * path — the probe panel is CAPPED ([[RecallPanelCap]] on the id
    * domain), so its size is a constant, not a corpus fraction, and
    * the exact pass costs O(panel × corpus) = one broadcast-probe
    * corpus scan no matter the scale (an uncapped %-sampled panel made
    * the evaluation quadratic — the sf1 headroom run measured 100×
    * pair growth at 10× data and this cap is the fix). The candidate
    * side is the bucketed join (never all-pairs); hits are a semi-join
    * of two probe-keyed sets.
    */
  val RecallK = 10
  val RecallPanelCap = 4000L

  def q103(spark: SparkSession, dir: String): DataFrame = {
    val sample = table(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
    val probes = sample
      .filter(col("vec_id") % 20 === 0 && col("vec_id") < RecallPanelCap)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    // the ranking key is floor(sim·10⁶): an exact integer from the same
    // IEEE double both engines fold in the same order — floor has no
    // HALF_UP boundary ambiguity, unlike round(), so this honors the
    // module header's BIGINT-ranking-key contract
    val exactTop = broadcast(probes)
      .crossJoin(sample.select(
        col("vec_id").as("neighbor_id"), col("embedding").as("ce")))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * lit(1000000d))
          .cast("long").as("sim_q"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("sim_q").desc, col("neighbor_id"))))
      .filter(col("rnk") <= RecallK)
      .select(col("probe_id"), col("neighbor_id"))
    // checkpointed (r16, guide §2.4): the probe side and the corpus
    // side below would otherwise each evaluate the sign-LSH dot-product
    // chain (a BroadcastExchange subtree cannot be unified with the
    // streamed side's by ReuseExchange)
    val bands = Similarity2.signBands(sample,
      Similarity2.bitsPerBand(spark, dir))
      .localCheckpoint()
    // the probe-side bands are ≤ 4×panel rows (the cap again) —
    // broadcast them so the corpus-side bands never shuffle; pairing
    // goes through the shared Similarity2.bucketPairs predicate
    val cand = Similarity2.bucketPairs(
      broadcast(bands.filter(
        col("vec_id") % 20 === 0 && col("vec_id") < RecallPanelCap)),
      bands)
      .select(col("va").as("probe_id"), col("vb").as("neighbor_id"))
    val nCand = cand.groupBy(col("probe_id")).agg(count(lit(1)).as("n_cand"))
    // exactTop is ≤ panel×k rows by construction — broadcast the hits join
    val nHits = broadcast(exactTop).join(cand, Seq("probe_id", "neighbor_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hits"))
    // both aggregates are ≤ |panel| rows — broadcast, don't sort-merge
    probes.select(col("probe_id"))
      .join(broadcast(nCand), Seq("probe_id"), "left")
      .join(broadcast(nHits), Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(coalesce(n_hits, 0L) * 100) DIV $RecallK").as("recall_pct"))
      .orderBy(col("probe_id"))
  }

  val q103Oracle: String =
    s"""WITH sample AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0),
       |${Similarity2.bandsCtesSql},
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe
       |  FROM sample WHERE vec_id % 20 = 0 AND vec_id < $RecallPanelCap),
       |pairs AS (
       |  SELECT p.probe_id AS pid, s.vec_id AS nid, p.pe, s.embedding AS ne
       |  FROM probes p JOIN sample s ON s.vec_id <> p.probe_id),
       |un AS (
       |  SELECT pid, nid, CAST(unnest(pe) AS DOUBLE) AS x,
       |         CAST(unnest(ne) AS DOUBLE) AS y
       |  FROM pairs),
       |sims AS (
       |  SELECT pid, nid,
       |         CAST(floor(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)))
       |                    * 1000000) AS BIGINT) AS sim_q
       |  FROM un GROUP BY pid, nid),
       |exact AS (
       |  SELECT pid, nid,
       |         row_number() OVER (PARTITION BY pid
       |                            ORDER BY sim_q DESC, nid) AS rnk
       |  FROM sims),
       |topk AS (SELECT pid, nid FROM exact WHERE rnk <= $RecallK),
       |${Similarity2.candCteSql(
            s"WHERE a.vec_id % 20 = 0 AND a.vec_id < $RecallPanelCap")},
       |ncand AS (SELECT va, count(*) AS n_cand FROM cand GROUP BY va),
       |nhits AS (
       |  SELECT t.pid, count(*) AS n_hits
       |  FROM topk t JOIN cand c ON t.pid = c.va AND t.nid = c.vb
       |  GROUP BY t.pid)
       |SELECT p.probe_id,
       |       CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
       |       CAST(coalesce(nh.n_hits, 0) AS BIGINT) AS n_hits,
       |       CAST((coalesce(nh.n_hits, 0) * 100) // $RecallK AS BIGINT)
       |         AS recall_pct
       |FROM probes p
       |LEFT JOIN ncand nc ON p.probe_id = nc.va
       |LEFT JOIN nhits nh ON p.probe_id = nh.pid
       |ORDER BY p.probe_id""".stripMargin

  // ---------------------------------------------------------------- q50

  /** Symmetric int8 quantization of embeddings: per-vector scale
    * 127/max|x|, element quantize floor(x*scale + 0.5) (round-half-up —
    * identical in both engines, unlike round()), then integer summary
    * stats. All outputs after the quantize are EXACT integer arithmetic,
    * so the hash compare certifies the quantized vectors themselves, not
    * a rounded proxy. maxabs is surfaced raw: abs/max only select parquet
    * values, no arithmetic to diverge. Zero-shuffle narrow map + final
    * sort; at 100 TB this runs at scan speed per partition.
    */
  def q50(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0)
      .withColumn("vd", expr("transform(embedding, e -> cast(e as double))"))
      .withColumn("maxabs",
        expr("aggregate(vd, 0d, (acc, e) -> greatest(acc, abs(e)))"))
      .withColumn("scale", lit(127.0) / greatest(col("maxabs"), lit(1e-30)))
      .withColumn("q",
        expr("transform(vd, e -> cast(floor(e * scale + 0.5d) as bigint))"))
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        size(col("q")).cast("long").as("n_dims"),
        expr("aggregate(q, 0L, (a, e) -> a + e)").as("sum_q"),
        expr("aggregate(q, 0L, (a, e) -> a + abs(e))").as("sum_abs_q"),
        expr("array_max(q)").as("max_q"),
        col("maxabs"))
      .orderBy(col("vec_id"))

  val q50Oracle: String =
    """WITH v AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS vd
      |  FROM embeddings WHERE vec_id % 4 = 0),
      |m AS (
      |  SELECT vec_id, label, vd,
      |         list_max(list_transform(vd, e -> abs(e))) AS maxabs
      |  FROM v),
      |q AS (
      |  SELECT vec_id, label, maxabs,
      |         list_transform(vd, e ->
      |           CAST(floor(e * (127.0 / greatest(maxabs, 1e-30)) + 0.5)
      |                AS BIGINT)) AS qv
      |  FROM m)
      |SELECT vec_id, CAST(label AS BIGINT) AS label,
      |       CAST(len(qv) AS BIGINT) AS n_dims,
      |       CAST(list_sum(qv) AS BIGINT) AS sum_q,
      |       CAST(list_sum(list_transform(qv, e -> abs(e))) AS BIGINT)
      |         AS sum_abs_q,
      |       CAST(list_max(qv) AS BIGINT) AS max_q,
      |       maxabs
      |FROM q ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q237_jl_projection" -> (q237 _),
    "q238_hard_negatives" -> (q238 _),
    "q239_cluster_purity" -> (q239 _),
    "q110_label_prop" -> (q110 _),
    "q233_silhouette" -> (q233 _),
    "q219_pca_power" -> (q219 _),
    "q103_ann_recall" -> (q103 _),
    "q50_embedding_quantize" -> (q50 _))

  val oracles: Map[String, String] = Map(
    "q237_jl_projection" -> q237Oracle,
    "q238_hard_negatives" -> q238Oracle,
    "q239_cluster_purity" -> q239Oracle,
    "q110_label_prop" -> q110Oracle,
    "q233_silhouette" -> q233Oracle,
    "q219_pca_power" -> q219Oracle,
    "q103_ann_recall" -> q103Oracle,
    "q50_embedding_quantize" -> q50Oracle)
}
