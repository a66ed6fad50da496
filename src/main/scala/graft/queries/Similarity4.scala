package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.VectorOps

/** q170-q171: SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540).
  *
  * The method: cluster the embedding space with k-means, then compare
  * pairs ONLY within a cluster — the cluster granularity turns the
  * O(n²) all-pairs problem into O(Σ cᵢ²) bounded blocks, the same
  * blocking idea LSH banding uses for text ([[Dedup]] q21) but driven
  * by the embedding geometry instead of token shingles. A document is
  * a semantic duplicate when some other member of its cluster is
  * within ε (cosine ≥ τ); one representative per ε-ball is kept.
  *
  * Grounding in the shared exact-KMeans contract: the clustering is
  * [[Similarity.kmClusters]] — the SAME memoized integer-exact fit q94
  * verifies, and the oracles below reuse [[Similarity.kmAssignCtes]]
  * verbatim, so trainer drift between the three queries is impossible.
  * Keep policy is deterministic keep-lowest-id: a doc is dropped iff a
  * LOWER-id member of its cluster sits at sim ≥ τ (SemDeDup keeps the
  * point closest to the centroid; any fixed representative choice
  * gives the same drop COUNT per ε-chain, and min-id is the one a SQL
  * oracle can spell exactly).
  *
  * At 100 TB: k GROWS with the corpus — [[Similarity.kForCorpus]]
  * targets a constant expected cluster size
  * ([[Similarity.KmDocsPerCluster]] docs), SemDeDup's own scaling rule
  * (the paper uses k=50 000 on LAION), so the within-cluster pair pass
  * is O(n · blockSize) = LINEAR in the corpus, never O(n²/k) with a
  * pinned k (round 9 measured the pinned-k version at 16× wall on 10×
  * data; the oracle's `kpar` CTE derives the identical k from the same
  * count, keeping every scale factor under the hash gate). The pair
  * join shuffles on the cluster id, so at real k the join keys are
  * plentiful and well-spread (the assignment itself balances blocks);
  * the per-doc max-sim aggregation rides the same partitioning.
  * Threshold τ=0.40 is calibrated to this synthetic corpus (random-ish
  * 64-dim embeddings top out near 0.48 pairwise cosine); production
  * SemDeDup on real embeddings uses τ≈0.95+.
  */
object Similarity4 {

  /** Permille thresholds swept by q171 (τ = t/1000). */
  private val CurveThresholds = Seq(350L, 380L, 400L, 420L, 450L)

  private val SemDedupTau = 400L // q170's τ, permille

  /** Per-doc semantic-dup scalar: (vec_id, cluster, max_sim_lower) —
    * the max rounded cosine from this doc to any LOWER-id member of
    * its trained cluster (docs with no lower-id cluster-mate get no
    * row). One within-cluster pair pass serves both q170 (threshold
    * verdict) and q171 (threshold sweep): "dup at τ" ≡
    * max_sim_lower ≥ τ.
    */
  private def maxSimToLower(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Similarity.kmClusters(spark, dir)
    val lo = clusters.select(col("cluster").as("l_cluster"),
      col("vec_id").as("l_id"), col("embedding").as("l_emb"))
    clusters
      .join(lo, col("cluster") === col("l_cluster") &&
        col("l_id") < col("vec_id"))
      .groupBy(col("vec_id"), col("cluster"))
      .agg(max(round(VectorOps.cosineNative(col("embedding"), col("l_emb")), 6))
        .as("max_sim_lower"))
  }

  /** DuckDB twin of [[maxSimToLower]]: trained assignment via the
    * shared CTE chain, then within-cluster lower-id pairs through
    * [[Similarity.cosineCtes]]. Emits `msl(vec_id, cluster,
    * max_sim_lower)`.
    */
  private val mslCtes: String =
    s"""${Similarity.kmAssignCtes},
       |pairs AS (
       |  SELECT a.vec_id AS pid, b.vec_id AS nid,
       |         ea.embedding AS pe, eb.embedding AS ne
       |  FROM asgF a
       |  JOIN asgF b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id),
       |${Similarity.cosineCtes("pairs", "psims")},
       |msl AS (
       |  SELECT s.pid AS vec_id, a.cluster,
       |         max(round(s.sim, 6)) AS max_sim_lower
       |  FROM psims s JOIN asgF a ON a.vec_id = s.pid
       |  GROUP BY s.pid, a.cluster)""".stripMargin

  // ---------------------------------------------------------------- q170

  /** q170: SemDeDup verdict per trained cluster — members, semantic
    * duplicates at τ=0.40, integer drop permille, and the lowest
    * dropped id as the auditable example (-1 when the cluster is
    * duplicate-free). The corpus-scale work is one within-cluster pair
    * pass + a per-doc max; the output is k rows.
    */
  def q170(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Similarity.kmClusters(spark, dir)
    val dropped = maxSimToLower(spark, dir)
      .filter(col("max_sim_lower") >= lit(SemDedupTau).cast("double") / 1000d)
      .select(col("vec_id").as("d_id"), col("cluster").as("d_cluster"))
    val members = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
    val drops = dropped.groupBy(col("d_cluster").as("cluster"))
      .agg(count(lit(1)).as("n_dropped"), min(col("d_id")).as("min_dropped_id"))
    members.join(drops, Seq("cluster"), "left")
      .select(col("cluster").cast("long").as("cluster"),
        col("n_members"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("min_dropped_id"), lit(-1L)).as("min_dropped_id"))
      .withColumn("drop_permille", expr("n_dropped * 1000 DIV n_members"))
      .select(col("cluster"), col("n_members"), col("n_dropped"),
        col("drop_permille"), col("min_dropped_id"))
      .orderBy(col("cluster"))
  }

  val q170Oracle: String =
    s"""WITH $mslCtes,
       |mem AS (
       |  SELECT cluster, count(*) AS n_members FROM asgF GROUP BY cluster),
       |drp AS (
       |  SELECT cluster, count(*) AS n_dropped, min(vec_id) AS min_dropped_id
       |  FROM msl
       |  WHERE max_sim_lower >= CAST($SemDedupTau AS DOUBLE) / 1000
       |  GROUP BY cluster)
       |SELECT CAST(m.cluster AS BIGINT) AS cluster,
       |       CAST(m.n_members AS BIGINT) AS n_members,
       |       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       |       CAST(COALESCE(d.n_dropped, 0) * 1000 // m.n_members AS BIGINT)
       |         AS drop_permille,
       |       CAST(COALESCE(d.min_dropped_id, -1) AS BIGINT) AS min_dropped_id
       |FROM mem m LEFT JOIN drp d ON m.cluster = d.cluster
       |ORDER BY cluster""".stripMargin

  // ---------------------------------------------------------------- q171

  /** q171: the SemDeDup pruning curve — corpus drop count and permille
    * at each candidate τ, from ONE pair pass. This is the knob-tuning
    * view the paper's §4 sweeps: how much data each ε would remove.
    * The per-doc `max_sim_lower` scalar is computed once; every
    * threshold is a conditional sum in the SAME aggregation pass
    * (then stack() unpivots the single wide row), so the sweep costs
    * one corpus aggregation regardless of how many τ are probed — no
    * threshold join at all.
    */
  def q171(spark: SparkSession, dir: String): DataFrame = {
    val nTotal = Similarity.kmClusters(spark, dir)
      .agg(count(lit(1)).as("n_total"))
    // One conditional-sum pass over the per-doc scalar covers every τ —
    // no threshold join at all; stack() unpivots the single row.
    // coalesce: the global agg over an EMPTY per-doc frame (every
    // cluster a singleton, e.g. k ≥ n) yields one all-NULL row where
    // the oracle's LEFT JOIN + count() yields 0
    val sums = CurveThresholds.map { t =>
      coalesce(
        sum(when(col("max_sim_lower") >= lit(t).cast("double") / 1000d, 1L)
          .otherwise(0L)),
        lit(0L)).as(s"d$t")
    }
    val wide = maxSimToLower(spark, dir).agg(sums.head, sums.tail: _*)
    val stackArgs = CurveThresholds
      .map(t => s"${t}L, d$t").mkString(", ")
    wide.select(expr(
        s"stack(${CurveThresholds.size}, $stackArgs) AS (threshold_permille, n_dropped)"))
      .crossJoin(broadcast(nTotal))
      .select(col("threshold_permille"), col("n_dropped"),
        expr("n_dropped * 1000 DIV n_total").as("drop_permille"))
      .orderBy(col("threshold_permille"))
  }

  val q171Oracle: String =
    s"""WITH $mslCtes,
       |thresholds(threshold_permille) AS (
       |  VALUES ${CurveThresholds.map(t => s"($t)").mkString(", ")}),
       |tot AS (SELECT count(*) AS n_total FROM asgF)
       |SELECT CAST(t.threshold_permille AS BIGINT) AS threshold_permille,
       |       CAST(count(m.vec_id) AS BIGINT) AS n_dropped,
       |       CAST(count(m.vec_id) * 1000 // any_value(tot.n_total) AS BIGINT)
       |         AS drop_permille
       |FROM thresholds t
       |CROSS JOIN tot
       |LEFT JOIN msl m
       |  ON m.max_sim_lower >= CAST(t.threshold_permille AS DOUBLE) / 1000
       |GROUP BY t.threshold_permille
       |ORDER BY threshold_permille""".stripMargin

  // ---------------------------------------------------------------- q192

  /** Anchor panel bound: vec_id % 40 = 0 AND vec_id < this — a FIXED
    * 50-anchor panel at any corpus size (the q103/q224 fixed-panel rule;
    * a bare corpus-fraction modulus made the sims pass O(n²/40) — the
    * round-6 "never a corpus fraction" violation the sf1 headroom table
    * caught at 6× wall on 10× data). Inert at the sf0.01/sf0.1 gates
    * (both corpora sit below it), so the gate hashes pin that the bound
    * changes nothing where the oracle can see.
    */
  val AnchorPanelMax = 2000L

  /** q192: hard-negative mining for contrastive training — for each
    * anchor in a deterministic FIXED panel (vec_id % 40 = 0, capped by
    * [[AnchorPanelMax]]), the top-3
    * OTHER-label vectors by cosine (the negatives a contrastive loss
    * learns most from; cf. Robinson et al. 2021, "Contrastive Learning
    * with Hard Negative Samples", arXiv:2010.04592). Same plan family
    * as q19/q103: the anchor panel is BROADCAST so the corpus side is
    * one narrow codegen'd pass through the native `cosine_sim`
    * expression, ranked under a literal-bound row_number →
    * WindowGroupLimit. At 100 TB the panel is the knob: cost is
    * O(panel × corpus), linear in the corpus for a fixed panel, and an
    * IVF/PQ shortlist (q94/q158) slots in as the candidate side when
    * the panel itself scales.
    */
  def q192(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val anchors = emb
      .filter(col("vec_id") % 40 === 0 && col("vec_id") < AnchorPanelMax)
      .select(col("vec_id").as("anchor_id"),
        col("label").as("anchor_label"), col("embedding").as("ae"))
    val cands = emb.select(col("vec_id").as("neighbor_id"),
      col("label").as("neighbor_label"), col("embedding").as("ce"))
    val sims = broadcast(anchors).crossJoin(cands)
      .filter(col("neighbor_label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label"), col("neighbor_id"),
        col("neighbor_label"),
        round(VectorOps.cosineNative(col("ae"), col("ce")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("anchor_id"), col("rnk"))
  }

  val q192Oracle: String =
    s"""WITH pairs AS (
       |  SELECT p.vec_id AS pid, c.vec_id AS nid,
       |         p.embedding AS pe, c.embedding AS ne,
       |         p.label AS pl, c.label AS nl
       |  FROM embeddings p, embeddings c
       |  WHERE p.vec_id % 40 = 0 AND p.vec_id < $AnchorPanelMax
       |    AND c.label <> p.label),
       |${Similarity.cosineCtes("pairs", "sims")},
       |lab AS (SELECT DISTINCT pid, nid, pl, nl FROM pairs),
       |ranked AS (
       |  SELECT s.pid, s.nid, l.pl, l.nl, round(sim, 6) AS sim,
       |         row_number() OVER (PARTITION BY s.pid
       |                            ORDER BY round(sim, 6) DESC, s.nid)
       |           AS rnk
       |  FROM sims s JOIN lab l ON l.pid = s.pid AND l.nid = s.nid)
       |SELECT pid AS anchor_id, pl AS anchor_label, nid AS neighbor_id,
       |       nl AS neighbor_label, sim, CAST(rnk AS BIGINT) AS rnk
       |FROM ranked WHERE rnk <= 3 ORDER BY anchor_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q204

  /** q204: mutual (reciprocal) nearest neighbors between two fixed
    * vector panels — the bitext-mining/embedding-alignment primitive
    * (Artetxe & Schwenk 2019, margin-based mining): a pair (a, b) is
    * kept iff b is a's top-1 AND a is b's top-1, scored with the
    * top1−top2 margin that separates confident alignments from hubs.
    * Panels are FIXED id ranges (the q19 discipline — never a corpus
    * fraction), so the pair frame is panel², constant at any corpus
    * size; production replaces the exhaustive pair pass with an IVF/PQ
    * shortlist (q94/q158) per side. Ranking runs on integer micro-sims
    * (one quantization, both engines); the margin is an exact integer
    * difference of those micros.
    */
  def q204(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val a = emb.filter(col("vec_id") < 40)
      .select(col("vec_id").as("a_id"), col("embedding").as("ae"))
    val b = emb.filter(col("vec_id") >= 100 && col("vec_id") < 140)
      .select(col("vec_id").as("b_id"), col("embedding").as("be"))
    // both sim (reported) and sm (ranking key) quantize the RAW cosine —
    // deriving sm from the already-rounded sim would double-round, which
    // the oracle cannot reproduce exactly. sm is FLOOR-quantized (the
    // round-6 ranking-key discipline: Spark's Round re-reads the double
    // through its shortest decimal repr before HALF_UP, DuckDB rounds
    // the exact binary — floor of the identical product is safe).
    val pairs = broadcast(a).crossJoin(broadcast(b))
      .select(col("a_id"), col("b_id"),
        VectorOps.cosineNative(col("ae"), col("be")).as("raw"))
      .select(col("a_id"), col("b_id"),
        round(col("raw"), 6).as("sim"),
        floor(col("raw") * 1000000d).cast("long").as("sm"))
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id")).orderBy(col("sm").desc, col("b_id"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b_id")).orderBy(col("sm").desc, col("a_id"))
    pairs
      .withColumn("rka", row_number().over(wa))
      .withColumn("next_sm", lead(col("sm"), 1).over(wa))
      .withColumn("rkb", row_number().over(wb))
      .filter(col("rka") === 1 && col("rkb") === 1)
      .select(col("a_id"), col("b_id"), col("sim"),
        (col("sm") - col("next_sm")).as("margin_micro"))
      .orderBy(col("a_id"))
  }

  val q204Oracle: String =
    s"""WITH pairs AS (
       |  SELECT a.vec_id AS pid, b.vec_id AS nid,
       |         a.embedding AS pe, b.embedding AS ne
       |  FROM embeddings a, embeddings b
       |  WHERE a.vec_id < 40 AND b.vec_id >= 100 AND b.vec_id < 140),
       |${Similarity.cosineCtes("pairs", "sims")},
       |q AS (
       |  SELECT s.pid, s.nid, round(s.sim, 6) AS sim,
       |         CAST(floor(s.sim * 1000000) AS BIGINT) AS sm
       |  FROM sims s),
       |ra AS (
       |  SELECT pid, nid, sim, sm,
       |         row_number() OVER wa AS rka,
       |         lead(sm, 1) OVER wa AS next_sm
       |  FROM q WINDOW wa AS (PARTITION BY pid ORDER BY sm DESC, nid)),
       |rb AS (
       |  SELECT pid, nid,
       |         row_number() OVER (PARTITION BY nid ORDER BY sm DESC, pid)
       |           AS rkb
       |  FROM q)
       |SELECT ra.pid AS a_id, ra.nid AS b_id, ra.sim,
       |       CAST(ra.sm - ra.next_sm AS BIGINT) AS margin_micro
       |FROM ra JOIN rb ON rb.pid = ra.pid AND rb.nid = ra.nid
       |WHERE ra.rka = 1 AND rb.rkb = 1
       |ORDER BY a_id""".stripMargin

  // ---------------------------------------------------------------- q211

  /** nprobe values swept by q211. */
  private val NProbes = Seq(1, 2, 4)

  /** q211: the IVF recall/nprobe tuning curve — the knob-sweep view of
    * the trained index that q103's single-point recall cannot give
    * (the SemDeDup analogue is q171's τ-sweep): for the fixed probe
    * panel (vec_id 10–14), search the [[Similarity.kmClusters]] index
    * with nprobe ∈ {1, 2, 4} nearest centroids and report, per nprobe,
    * the candidate volume actually scanned and recall@3 against the
    * exhaustive ground truth, in integer permille. This is THE
    * operating table an ANN deployment tunes from: how much recall
    * each unit of extra scan buys.
    *
    * Exactness: centroid ranking runs on the integer squared-L2
    * distances of the SETTLED codebook ([[Similarity.kmCentroids]] —
    * the coordinates the final assignment used, not a recomputed
    * mean); cosine ranking keys are floor-quantized micro-sims (the
    * q204 discipline). Scale shape: the panel is FIXED (q19 rule), the
    * candidate side is cluster-pruned (expected blockSize·nprobe per
    * probe at any corpus size — adaptive k keeps that constant), and
    * the exhaustive ground-truth pass is O(panel × corpus), linear in
    * the corpus — the eval cost, not the index cost.
    */
  def q211(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = Similarity.kmClusters(spark, dir)
    val cents = Similarity.kmCentroids(spark, dir)
    val probes = clusters.filter(col("vec_id").between(10, 14))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${Similarity.KmScale}D) AS BIGINT))")
          .as("pq"))
    val wC = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist"), col("cent_id"))
    // the PANEL broadcasts, the codebook streams: k = n/200 is corpus-
    // proportional, so the centroid frame is never the broadcast side
    val selected = broadcast(probes).crossJoin(cents)
      .select(col("probe_id"), col("pe"), col("cent_id"),
        VectorOps.intSqDist(col("pq"), col("cq")).as("dist"))
      .withColumn("crank", row_number().over(wC))
      .filter(col("crank") <= NProbes.max)
      .select(col("probe_id"), col("pe"), col("cent_id"), col("crank"))
    val nps = explode(array(NProbes.map(lit): _*)).as("nprobe")
    // OPTIMIZATION r16 (guide §3.1): the probed-centroid frame is
    // panel×nprobe rows (≤ 40 at any corpus size) — broadcast it so the
    // corpus-side cluster scan never shuffles (SMJ -> BHJ).
    val cands = broadcast(selected.select(col("probe_id"), col("pe"),
        col("cent_id"), col("crank"), nps)
      .filter(col("crank") <= col("nprobe")))
      .join(clusters.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce"), col("cluster")),
        col("cent_id") === col("cluster") &&
          col("neighbor_id") =!= col("probe_id"))
      .select(col("nprobe"), col("probe_id"), col("neighbor_id"),
        col("pe"), col("ce"))
      .localCheckpoint() // 2 consumers: volume count + ranked search
    val wTop = Window.partitionBy(col("nprobe"), col("probe_id"))
      .orderBy(col("sm").desc, col("neighbor_id"))
    val approx3 = cands
      .select(col("nprobe"), col("probe_id"), col("neighbor_id"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * 1000000d)
          .cast("long").as("sm"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= 3)
      .select(col("nprobe"), col("probe_id"), col("neighbor_id"))
    val wGt = Window.partitionBy(col("probe_id"))
      .orderBy(col("sm").desc, col("neighbor_id"))
    val gt3 = broadcast(probes.select(col("probe_id"), col("pe")))
      .crossJoin(table(spark, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce")))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * 1000000d)
          .cast("long").as("sm"))
      .withColumn("rnk", row_number().over(wGt))
      .filter(col("rnk") <= 3)
      .select(col("probe_id"), col("neighbor_id"))
    val hits = approx3
      .join(broadcast(gt3), Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
    val nPanel = 5L
    cands.groupBy(col("nprobe")).agg(count(lit(1)).as("n_candidates"))
      .join(broadcast(hits), Seq("nprobe"), "left") // ≤ |NProbes| rows
      .select(col("nprobe").cast("long").as("nprobe"), col("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"1000 * coalesce(n_hits, 0) DIV ${3 * nPanel}")
          .as("recall_permille"))
      .orderBy(col("nprobe"))
  }

  val q211Oracle: String = {
    val npValues = NProbes.map(n => s"($n)").mkString(", ")
    s"""WITH ${Similarity.kmAssignCtes},
       |cdist AS (
       |  SELECT eq.vec_id AS pid, c.cent_id,
       |         sum((eq.x - c.x) * (eq.x - c.x)) AS dist
       |  FROM eq JOIN cbF c ON eq.d = c.d
       |  WHERE eq.vec_id BETWEEN 10 AND 14
       |  GROUP BY eq.vec_id, c.cent_id),
       |crank AS (
       |  SELECT pid, cent_id,
       |         row_number() OVER (PARTITION BY pid
       |                            ORDER BY dist, cent_id) AS rnk
       |  FROM cdist),
       |nps(np) AS (VALUES $npValues),
       |cands AS MATERIALIZED (
       |  SELECT n.np, r.pid, a.vec_id AS nid
       |  FROM crank r CROSS JOIN nps n
       |  JOIN asgF a ON a.cluster = r.cent_id AND a.vec_id <> r.pid
       |  WHERE r.rnk <= n.np),
       |spairs AS (
       |  SELECT DISTINCT c.pid, c.nid, ep.embedding AS pe, en.embedding AS ne
       |  FROM cands c
       |  JOIN embeddings ep ON ep.vec_id = c.pid
       |  JOIN embeddings en ON en.vec_id = c.nid),
       |${Similarity.cosineCtes("spairs", "csims")},
       |approx3 AS (
       |  SELECT np, pid, nid FROM (
       |    SELECT c.np, c.pid, c.nid,
       |           row_number() OVER (
       |             PARTITION BY c.np, c.pid
       |             ORDER BY CAST(floor(s.sim * 1000000) AS BIGINT) DESC,
       |                      c.nid) AS rnk
       |    FROM cands c JOIN csims s ON s.pid = c.pid AND s.nid = c.nid) t
       |  WHERE rnk <= 3),
       |gpairs AS (
       |  SELECT p.vec_id AS pid, e.vec_id AS nid,
       |         p.embedding AS pe, e.embedding AS ne
       |  FROM embeddings p, embeddings e
       |  WHERE p.vec_id BETWEEN 10 AND 14 AND e.vec_id <> p.vec_id),
       |${Similarity.cosineCtes("gpairs", "gsims")},
       |gt3 AS MATERIALIZED (
       |  SELECT pid, nid FROM (
       |    SELECT pid, nid,
       |           row_number() OVER (
       |             PARTITION BY pid
       |             ORDER BY CAST(floor(sim * 1000000) AS BIGINT) DESC,
       |                      nid) AS rnk
       |    FROM gsims) t
       |  WHERE rnk <= 3),
       |hits AS (
       |  SELECT a.np, count(*) AS n_hits
       |  FROM approx3 a JOIN gt3 g ON g.pid = a.pid AND g.nid = a.nid
       |  GROUP BY a.np),
       |vol AS (SELECT np, count(*) AS n_candidates FROM cands GROUP BY np)
       |SELECT CAST(v.np AS BIGINT) AS nprobe,
       |       CAST(v.n_candidates AS BIGINT) AS n_candidates,
       |       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |       CAST(1000 * COALESCE(h.n_hits, 0) // 15 AS BIGINT)
       |         AS recall_permille
       |FROM vol v LEFT JOIN hits h ON h.np = v.np
       |ORDER BY nprobe""".stripMargin
  }

  // ---------------------------------------------------------------- q224

  /** q224 probes: a fixed eval panel disjoint from q211's (the
    * fixed-size-panel rule — never a corpus fraction). */
  private val MrrProbeLo = 20L
  private val MrrProbeHi = 29L
  private val MrrNProbe = 2

  /** q224: MEAN-RECIPROCAL-RANK eval of the trained IVF index — the
    * second IR metric of the eval family (q103 recall@k, q211 the
    * recall/nprobe curve): for each panel probe, WHERE does the index
    * rank the TRUE nearest neighbor? recall@k only answers "inside the
    * top k or not"; MRR grades the whole ranking, which is what a
    * retrieval-augmented pipeline actually consumes. Per probe: the
    * exhaustive rank-1 neighbor (ground truth), its rank in the
    * nprobe=[[MrrNProbe]] IVF candidate ranking (0 = the truth was in a
    * pruned cluster — the IVF failure mode recall curves hide), and the
    * reciprocal rank in EXACT integer permicro (1000000 DIV rank).
    *
    * Scale shape: ground truth is a fixed-panel × corpus scan (the
    * brute-force baseline priced once per eval, q103's contract); the
    * IVF side touches only the probed clusters; similarity ranks on
    * floor-quantized cosine with id tie-breaks so both engines agree
    * bit-for-bit. Codebooks come from the memoized trainer.
    */
  def q224(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = Similarity.kmClusters(spark, dir)
    val cents = Similarity.kmCentroids(spark, dir)
    val probes = clusters
      .filter(col("vec_id").between(MrrProbeLo, MrrProbeHi))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * ${Similarity.KmScale}D) AS BIGINT))")
          .as("pq"))
    val wC = Window.partitionBy(col("probe_id"))
      .orderBy(col("dist"), col("cent_id"))
    // panel broadcasts, corpus-proportional codebook streams (q211 rule)
    val selCents = broadcast(probes).crossJoin(cents)
      .select(col("probe_id"), col("pe"), col("cent_id"),
        VectorOps.intSqDist(col("pq"), col("cq")).as("dist"))
      .withColumn("crank", row_number().over(wC))
      .filter(col("crank") <= MrrNProbe)
      .select(col("probe_id"), col("pe"), col("cent_id"))
    val wTop = Window.partitionBy(col("probe_id"))
      .orderBy(col("sm").desc, col("neighbor_id"))
    // OPTIMIZATION r16 (guide §3.1): selCents is panel×nprobe rows —
    // broadcast so the corpus cluster side never shuffles (SMJ -> BHJ)
    val ranked = broadcast(selCents)
      .join(clusters.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce"), col("cluster")),
        col("cent_id") === col("cluster") &&
          col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * 1000000d)
          .cast("long").as("sm"))
      .withColumn("ivf_rank", row_number().over(wTop).cast("long"))
    val wGt = Window.partitionBy(col("probe_id"))
      .orderBy(col("sm").desc, col("neighbor_id"))
    val gt1 = broadcast(probes.select(col("probe_id"), col("pe")))
      .crossJoin(table(spark, dir, "embeddings")
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("ce")))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * 1000000d)
          .cast("long").as("sm"))
      .withColumn("rnk", row_number().over(wGt))
      .filter(col("rnk") === 1)
      .select(col("probe_id"), col("neighbor_id").as("gt_nid"))
    gt1
      // panel × probed-cluster members (≤ panel × nprobe × cluster size,
      // corpus-independent) — broadcast (SMJ -> BHJ, guide §3.1)
      .join(broadcast(ranked.select(col("probe_id"),
        col("neighbor_id").as("gt_nid"), col("ivf_rank"))),
        Seq("probe_id", "gt_nid"), "left")
      .select(col("probe_id"), col("gt_nid"),
        coalesce(col("ivf_rank"), lit(0L)).as("ivf_rank"),
        expr("CASE WHEN ivf_rank IS NULL THEN 0L ELSE 1000000 DIV ivf_rank END")
          .as("rr_permicro"))
      .orderBy(col("probe_id"))
  }

  val q224Oracle: String =
    s"""WITH ${Similarity.kmAssignCtes},
       |cdist AS (
       |  SELECT eq.vec_id AS pid, c.cent_id,
       |         sum((eq.x - c.x) * (eq.x - c.x)) AS dist
       |  FROM eq JOIN cbF c ON eq.d = c.d
       |  WHERE eq.vec_id BETWEEN $MrrProbeLo AND $MrrProbeHi
       |  GROUP BY eq.vec_id, c.cent_id),
       |crank AS (
       |  SELECT pid, cent_id,
       |         row_number() OVER (PARTITION BY pid
       |                            ORDER BY dist, cent_id) AS rnk
       |  FROM cdist),
       |cands AS MATERIALIZED (
       |  SELECT r.pid, a.vec_id AS nid
       |  FROM crank r
       |  JOIN asgF a ON a.cluster = r.cent_id AND a.vec_id <> r.pid
       |  WHERE r.rnk <= $MrrNProbe),
       |spairs AS (
       |  SELECT DISTINCT c.pid, c.nid, ep.embedding AS pe, en.embedding AS ne
       |  FROM cands c
       |  JOIN embeddings ep ON ep.vec_id = c.pid
       |  JOIN embeddings en ON en.vec_id = c.nid),
       |${Similarity.cosineCtes("spairs", "csims")},
       |ranked AS (
       |  SELECT pid, nid,
       |         row_number() OVER (
       |           PARTITION BY pid
       |           ORDER BY CAST(floor(sim * 1000000) AS BIGINT) DESC,
       |                    nid) AS ivf_rank
       |  FROM csims),
       |gpairs AS (
       |  SELECT p.vec_id AS pid, e.vec_id AS nid,
       |         p.embedding AS pe, e.embedding AS ne
       |  FROM embeddings p, embeddings e
       |  WHERE p.vec_id BETWEEN $MrrProbeLo AND $MrrProbeHi
       |    AND e.vec_id <> p.vec_id),
       |${Similarity.cosineCtes("gpairs", "gsims")},
       |gt1 AS (
       |  SELECT pid, nid FROM (
       |    SELECT pid, nid,
       |           row_number() OVER (
       |             PARTITION BY pid
       |             ORDER BY CAST(floor(sim * 1000000) AS BIGINT) DESC,
       |                      nid) AS rnk
       |    FROM gsims) t
       |  WHERE rnk = 1)
       |SELECT CAST(g.pid AS BIGINT) AS probe_id,
       |       CAST(g.nid AS BIGINT) AS gt_nid,
       |       CAST(COALESCE(r.ivf_rank, 0) AS BIGINT) AS ivf_rank,
       |       CAST(CASE WHEN r.ivf_rank IS NULL THEN 0
       |                 ELSE 1000000 // r.ivf_rank END AS BIGINT)
       |         AS rr_permicro
       |FROM gt1 g LEFT JOIN ranked r ON r.pid = g.pid AND r.nid = g.nid
       |ORDER BY probe_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q224_ivf_mrr" -> (q224 _),
    "q170_semantic_dedup" -> (q170 _),
    "q171_semdedup_curve" -> (q171 _),
    "q192_hard_negatives" -> (q192 _),
    "q204_mutual_nn" -> (q204 _),
    "q211_ivf_nprobe_sweep" -> (q211 _))

  val oracles: Map[String, String] = Map(
    "q170_semantic_dedup" -> q170Oracle,
    "q171_semdedup_curve" -> q171Oracle,
    "q192_hard_negatives" -> q192Oracle,
    "q204_mutual_nn" -> q204Oracle,
    "q211_ivf_nprobe_sweep" -> q211Oracle,
    "q224_ivf_mrr" -> q224Oracle)
}
