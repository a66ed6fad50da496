package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-10 pack #5: the structural-evaluation shapes still missing
  * from the 232-query surface — cluster-quality scoring of the trained
  * IVF codebook (q233, simplified silhouette), sorted-neighborhood
  * dedup blocking (q234 — the O(n·w)-pair-budget alternative to LSH),
  * degree assortativity of the syndication graph (q235), and the
  * lang×split chi-square independence audit (q236).
  */
object PipelineOps17 {

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
    * evaluation itself. a ≤ b holds by construction (the assignment IS
    * the argmin over this codebook, ties → lower cent_id), so the score
    * sits in [0, 1000]; max(a,b)=0 (a vector ON two coincident
    * centroids) reports 0.
    *
    * Scale shape: the codebook (k rows, k = n div 200 by the adaptive
    * rule) broadcasts; the [[SilPanelMax]]-bounded evaluation panel —
    * NOT the corpus: panel×k distances stay linear in n where a full
    * pass would be O(n²/200) under the adaptive k — folds each of the
    * k distances to an int64 in-projection; everything after lands on
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
    val cents = broadcast(Similarity.kmCentroids(spark, dir))
    clusters.crossJoin(cents)
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
       |ab AS (
       |  SELECT f.vec_id, g.cluster,
       |         min(CASE WHEN f.cent_id = g.cluster THEN f.dist END) AS a2,
       |         min(CASE WHEN f.cent_id <> g.cluster THEN f.dist END) AS b2
       |  FROM aF f JOIN asgF g ON f.vec_id = g.vec_id
       |  WHERE f.vec_id < $SilPanelMax
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

  // ---------------------------------------------------------------- q234

  /** Sorted-neighborhood window: each doc pairs with the next
    * `SnmWindow − 1` docs in its block's (n_chars, doc_id) order. */
  val SnmWindow = 4

  /** Char-length band width of the sort blocks: the window runs inside
    * (lang, n_chars div width) cells, so no single task ever owns a
    * whole language (the q61 blocking discipline). */
  val SnmBandWidth = 64L

  /** Candidate pairs at or above this token-set Jaccard permille are
    * reported as near-dup matches. */
  val SnmMinJac = 600L

  /** Matches reported (total-order tie-break, rerun-stable). */
  val SnmTop = 20

  /** q234: SORTED-NEIGHBORHOOD dedup blocking (Hernández/Stolfo 1995,
    * the SNM "merge/purge" method) — the third blocking paradigm beside
    * hash banding (q21 MinHash, q42 SimHash) and prefix filtering
    * (q173 PPJoin): sort the corpus on a cheap proxy key (language,
    * then char length — near-dups rarely differ much in length), slide
    * a fixed window of [[SnmWindow]], and verify ONLY in-window pairs
    * by exact distinct-token-set Jaccard. Reports the top
    * [[SnmTop]] matched pairs at ≥ [[SnmMinJac]]‰.
    *
    * The scale argument is the OPPOSITE trade to LSH: candidate volume
    * is at most n·(w−1) — fixed per document BY CONSTRUCTION, immune to
    * hot buckets and threshold tuning (the failure modes candidatePairs
    * needs its df cap for). The sort is blocked: the window runs inside
    * (lang, [[SnmBandWidth]]-char length band) cells — near-dups rarely
    * differ much in length, so they share a band — which keeps every
    * sort task bounded instead of funnelling a whole language through
    * one window task (the q61 blocking discipline; a lang-wide window
    * would be the straggler the q114 lesson warns about). Recall is
    * heuristic twice over (a pair > w apart in the order, or straddling
    * a band edge, is missed) — that trade is the documented SNM
    * contract, and the multi-pass fix is a second run with an offset
    * band or a different sort key. One window pass computes all w−1
    * neighbor columns; the pair frame is an explode of those columns,
    * not a re-run of the sort per neighbor offset.
    */
  def q234(spark: SparkSession, dir: String): DataFrame = {
    val f = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        expr("array_distinct(filter(split(text, ' '), t -> t <> ''))")
          .as("toks"))
      .withColumn("band", expr(s"n_chars div $SnmBandWidth"))
    val win = Window.partitionBy(col("lang"), col("band"))
      .orderBy(col("n_chars"), col("doc_id"))
    val w = (1 until SnmWindow).foldLeft(f) { (df, j) =>
      df.withColumn(s"b_id_$j", lead(col("doc_id"), j).over(win))
        .withColumn(s"b_toks_$j", lead(col("toks"), j).over(win))
    }
    val pairs = w
      .select(col("lang"), col("doc_id").as("a_id"), col("toks"),
        explode(array((1 until SnmWindow).map { j =>
          struct(col(s"b_id_$j").as("b_id"), col(s"b_toks_$j").as("btoks"))
        }: _*)).as("nb"))
      .select(col("lang"), col("a_id"), col("nb.b_id").as("b_id"),
        col("toks"), col("nb.btoks").as("btoks"))
      .filter(col("b_id").isNotNull)
    pairs
      .withColumn("inter",
        size(array_intersect(col("toks"), col("btoks"))).cast("long"))
      .withColumn("uni",
        size(col("toks")).cast("long") + size(col("btoks")).cast("long")
          - col("inter"))
      .withColumn("jac_permille",
        expr("coalesce((1000 * inter) div nullif(uni, 0), 0)"))
      .filter(col("jac_permille") >= SnmMinJac)
      .select(col("lang"), col("a_id"), col("b_id"), col("jac_permille"))
      .orderBy(col("jac_permille").desc, col("a_id"), col("b_id"))
      .limit(SnmTop)
  }

  val q234Oracle: String = {
    val leads = (1 until SnmWindow).map { j =>
      s"lead(doc_id, $j) OVER win AS b_id_$j, lead(toks, $j) OVER win AS b_toks_$j"
    }.mkString(",\n         ")
    val branches = (1 until SnmWindow).map { j =>
      s"""  SELECT lang, doc_id AS a_id, b_id_$j AS b_id, toks,
         |         b_toks_$j AS btoks
         |  FROM w WHERE b_id_$j IS NOT NULL""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH f AS (
       |  SELECT doc_id, lang, length(text) AS n_chars,
       |         length(text) // $SnmBandWidth AS band,
       |         list_distinct(list_filter(string_split(text, ' '),
       |                                   t -> t <> '')) AS toks
       |  FROM documents),
       |w AS (
       |  SELECT lang, doc_id, toks,
       |         $leads
       |  FROM f
       |  WINDOW win AS (PARTITION BY lang, band ORDER BY n_chars, doc_id)),
       |pairs AS (
       |$branches),
       |j AS (
       |  SELECT lang, a_id, b_id,
       |         CAST(len(list_filter(toks, x -> list_contains(btoks, x)))
       |              AS BIGINT) AS inter,
       |         CAST(len(toks) + len(btoks) AS BIGINT) AS szsum
       |  FROM pairs),
       |scored AS (
       |  SELECT lang, a_id, b_id,
       |         COALESCE((1000 * inter) // nullif(szsum - inter, 0), 0)
       |           AS jac_permille
       |  FROM j)
       |SELECT lang, a_id, b_id, jac_permille
       |FROM scored WHERE jac_permille >= $SnmMinJac
       |ORDER BY jac_permille DESC, a_id, b_id LIMIT $SnmTop""".stripMargin
  }

  // ---------------------------------------------------------------- q235

  /** q235: DEGREE ASSORTATIVITY of the syndication graph (Newman 2002)
    * — do high-degree sources syndicate with other high-degree sources
    * (mirror farms copying each other, r > 0) or with the long tail
    * (aggregators scraping everyone, r < 0)? The one-number structural
    * summary of the graph whose per-node views q123 (rank), q206
    * (hubs/authorities) and q216 (link prediction) already report —
    * the SOURCE-graph member of the statistic q189 computes on the
    * doc-level LSH candidate graph (different graph, different
    * question: q189 audits the dedup pair structure, this audits the
    * syndication topology; this one also reduces to the canonical
    * UNDIRECTED edge set first and emits the exact sxy moment).
    *
    * r is the Pearson correlation of endpoint degrees over the
    * UNDIRECTED edge list, each edge contributing both orientations
    * (the handshake symmetrization — so Σx = Σy by construction, which
    * the spec pins). Degrees are tiny integers, so every moment is
    * int64-exact; only the final combination runs in DOUBLE (identical
    * single IEEE ops, the q189 discipline), with the exact `sxy`
    * emitted so the gate pins the integer moment. Degenerate variance
    * (a degree-regular graph) reports NULL on both engines via nullif.
    *
    * Scale shape: the corpus-scale work is the memoized
    * [[GraphRank.syndicationEdges]] frame (shared with q123/q161/q169/
    * q206/q216); everything here joins domain-sized frames with the
    * degree table broadcast.
    */
  def q235(spark: SparkSession, dir: String): DataFrame = {
    val ue = GraphRank.syndicationEdges(spark, dir)
      .select(least(col("src_from"), col("src_to")).as("u"),
        greatest(col("src_from"), col("src_to")).as("v"))
      .distinct()
    val deg = ue.select(col("u").as("s"))
      .unionAll(ue.select(col("v").as("s")))
      .groupBy(col("s")).agg(count(lit(1)).as("deg"))
    val joined = ue
      .join(broadcast(deg.select(col("s").as("u"), col("deg").as("du"))),
        Seq("u"))
      .join(broadcast(deg.select(col("s").as("v"), col("deg").as("dv"))),
        Seq("v"))
    val sym = joined.select(col("du").as("x"), col("dv").as("y"))
      .unionAll(joined.select(col("dv").as("x"), col("du").as("y")))
    val mo = sym.agg(
      count(lit(1)).as("m2"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val nn = broadcast(deg.agg(count(lit(1)).as("n_nodes")))
    val ne = broadcast(ue.agg(count(lit(1)).as("n_edges")))
    mo.crossJoin(nn).crossJoin(ne)
      .select(col("n_nodes"), col("n_edges"), col("sxy"),
        expr("round((cast(m2 as double) * sxy - cast(sx as double) * sy) /" +
          " nullif(sqrt(greatest(cast(m2 as double) * sxx -" +
          " cast(sx as double) * sx, 0)) *" +
          " sqrt(greatest(cast(m2 as double) * syy -" +
          " cast(sy as double) * sy, 0)), 0), 6)").as("assort_r"))
      .orderBy(col("n_nodes"))
  }

  // edgesCtePrefix is concatenated AFTER stripMargin: its `||` concat
  // operators would lose a pipe inside a stripMargin region (the
  // recorded round-7 trap)
  val q235Oracle: String =
    s"WITH ${GraphRank.edgesCtePrefix},\n" +
    s"""ue AS (
       |  SELECT DISTINCT least(src_from, src_to) AS u,
       |                  greatest(src_from, src_to) AS v
       |  FROM edges),
       |deg AS (
       |  SELECT s, count(*) AS deg FROM (
       |    SELECT u AS s FROM ue UNION ALL SELECT v AS s FROM ue) t
       |  GROUP BY s),
       |jn AS (
       |  SELECT d1.deg AS du, d2.deg AS dv
       |  FROM ue JOIN deg d1 ON d1.s = ue.u JOIN deg d2 ON d2.s = ue.v),
       |sam AS (
       |  SELECT du AS x, dv AS y FROM jn
       |  UNION ALL
       |  SELECT dv AS x, du AS y FROM jn),
       |mo AS (
       |  SELECT count(*) AS m2,
       |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(x * x) AS BIGINT) AS sxx,
       |         CAST(sum(y * y) AS BIGINT) AS syy,
       |         CAST(sum(x * y) AS BIGINT) AS sxy
       |  FROM sam),
       |nn AS (SELECT count(*) AS n_nodes FROM deg),
       |ne AS (SELECT count(*) AS n_edges FROM ue)
       |SELECT n_nodes, n_edges, sxy,
       |       round((CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
       |             nullif(sqrt(greatest(CAST(m2 AS DOUBLE) * sxx -
       |                         CAST(sx AS DOUBLE) * sx, 0)) *
       |                    sqrt(greatest(CAST(m2 AS DOUBLE) * syy -
       |                         CAST(sy AS DOUBLE) * sy, 0)), 0), 6)
       |         AS assort_r
       |FROM mo, nn, ne ORDER BY n_nodes""".stripMargin

  // ---------------------------------------------------------------- q236

  /** q236: lang×split CHI-SQUARE independence audit — is the q114
    * hash split independent of language, or did the salt accidentally
    * correlate with a stratum? q114 reports the shares; this query
    * reports the TEST: per-cell observed count, expected count (margin
    * product, exact integer milli), and the cell's X² contribution
    * (n·o − rt·ct)² / (n·rt·ct). The per-cell terms are emitted as RAW
    * doubles computed by the identical single-IEEE-op chain on
    * int64-exact inputs (bit-identical cross-engine; a cross-cell sum
    * would instead pin a float summation ORDER neither engine
    * guarantees — the spec does the summing and the df-based
    * significance call). Int64 budget: n·o and rt·ct exact while
    * n < 3·10⁹ docs; 1000·rt·ct needs n < 9.6·10⁷ (the q231
    * documentation discipline — permille-quantize margins beyond).
    *
    * Scale shape: one corpus scan into the ≤ |langs|×3 cell frame
    * (q114's aggregate); margins are windows OVER that tiny frame
    * (never a corpus re-scan — the q114 lesson); the test itself costs
    * nothing at any corpus size.
    */
  def q236(spark: SparkSession, dir: String): DataFrame = {
    val cells = table(spark, dir, "documents")
      .select(col("lang"), ReleaseOps.splitOf(col("doc_id")).as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("o"))
    cells
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("lang"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("split"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .select(col("lang"), col("split"), col("o"),
        expr("(1000 * rt * ct) div n").as("exp_milli"),
        expr("(cast(n * o - rt * ct as double) * cast(n * o - rt * ct as double))" +
          " / (cast(n as double) * cast(rt as double) * cast(ct as double))")
          .as("contrib"))
      .orderBy(col("lang"), col("split"))
  }

  val q236Oracle: String = {
    val h = graft.functions.CrossHash.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")
    s"""WITH assigned AS (
       |  SELECT lang,
       |         CASE WHEN $h % 1000 < ${ReleaseOps.SplitTrainUpto} THEN 'train'
       |              WHEN $h % 1000 < ${ReleaseOps.SplitValUpto} THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |cells AS (
       |  SELECT lang, split, count(*) AS o
       |  FROM assigned GROUP BY lang, split),
       |m AS (
       |  SELECT lang, split, o,
       |         CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS rt,
       |         CAST(sum(o) OVER (PARTITION BY split) AS BIGINT) AS ct,
       |         CAST(sum(o) OVER () AS BIGINT) AS n
       |  FROM cells)
       |SELECT lang, split, o,
       |       (1000 * rt * ct) // n AS exp_milli,
       |       (CAST(n * o - rt * ct AS DOUBLE) * CAST(n * o - rt * ct AS DOUBLE))
       |         / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
       |         AS contrib
       |FROM m ORDER BY lang, split""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q233_silhouette" -> (q233 _),
    "q234_snm_blocking" -> (q234 _),
    "q235_assortativity" -> (q235 _),
    "q236_split_chisq" -> (q236 _))

  val oracles: Map[String, String] = Map(
    "q233_silhouette" -> q233Oracle,
    "q234_snm_blocking" -> q234Oracle,
    "q235_assortativity" -> q235Oracle,
    "q236_split_chisq" -> q236Oracle)
}
