package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.{CrossHash, VectorOps}

/** Retrieval refinement and neighbor-based hygiene (absorbs the former
  * round-10 micro-packs #9/#10): Rocchio pseudo-relevance feedback
  * (q248), the word2vec unigram^0.75 negative-sampling table (q249),
  * MMR diversified re-ranking (q250), and k-NN label-noise detection
  * (q251) — the operators that refine a dense-retrieval shortlist or
  * audit it through its own neighbor structure.
  */
object RetrievalOps {


  // ---------------------------------------------------------------- q248

  /** q248 probe panel: vec_id % 31 = 0 AND vec_id < 3100 — ≤ 100 probes
    * at any corpus size (the q103/q192/q228 fixed-panel rule; 31 is
    * coprime to the other panels' moduli). */
  val PrfPanelMod = 31L
  val PrfPanelMax = 3100L

  /** Feedback depth (documents blended into the query) and the
    * evaluation depth (hits@k). */
  val PrfK = 10

  /** q248: ROCCHIO pseudo-relevance feedback — the classic two-pass
    * retrieval refinement (Rocchio 1971; blind PRF as in Buckley et
    * al., TREC-3): retrieve top-k, assume them relevant, move the query
    * toward their centroid, retrieve again. Reports, per probe, the
    * same-label hits@k BEFORE and AFTER feedback — the one-number
    * evidence for whether PRF helps on this corpus (it hurts exactly
    * when the first pass was off-topic, which is why the delta is the
    * readout). With α = 1, β = 1 the feedback query is q' = q +
    * centroid(top-k); cosine is scale-invariant, so q' is computed as
    * the INTEGER vector n·qv(q) + Σ qv(d) over [[VectorOps.quantize]]d
    * embeddings — an order-free exact sum (a float centroid would pin a
    * reduction order no engine guarantees) whose per-dim values
    * (≤ ~4·10⁵) are float-exact, so both engines re-rank the identical
    * feedback vector. Ranking keys are floor-quantized micro-sims with
    * id tie-breaks (the q204/q211 discipline).
    *
    * Scale shape: both passes are broadcast-panel × corpus — one narrow
    * codegen'd scan each, linear in the corpus for the fixed panel
    * (q192's contract; an IVF shortlist slots in when the panel
    * scales). The centroid build runs on panel×k×64 exploded rows —
    * bounded. Like every fixed-dim consumer (q228/q246), the ragged
    * tail is excluded up front (len = 64 on both engines).
    */
  def q248(spark: SparkSession, dir: String): DataFrame = {
    val emb64 = table(spark, dir, "embeddings")
      .filter(size(col("embedding")) === 64)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"))
    val probes = emb64
      .filter(col("vec_id") % PrfPanelMod === 0 &&
        col("vec_id") < PrfPanelMax)
      .select(col("vec_id").as("pid"), col("label").as("plabel"),
        col("embedding").as("pe"))
    val cands = emb64.select(col("vec_id").as("nid"),
      col("label").as("nlabel"), col("embedding").as("ce"))
    def topK(pairs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("pid"))
        .orderBy(col("sm").desc, col("nid"))
      pairs.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= PrfK)
    }
    val pass1 = topK(broadcast(probes).crossJoin(cands)
      .filter(col("nid") =!= col("pid"))
      .select(col("pid"), col("nid"), col("nlabel"), col("plabel"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * 1000000d)
          .cast("long").as("sm")))
      .localCheckpoint() // feeds hits_before, the centroid, and n_ret
    // quantize AFTER the id joins: only the ~panel×k retrieved vectors
    // and the panel itself are transformed, never the whole corpus (the
    // corpus already paid its two cosine passes; a third corpus-wide
    // array transform here would be pure waste)
    // OPTIMIZATION r17 (guide §2.4, the q250/q137 fold discipline): the
    // centroid build ran as posexplode → (pid, d) aggregate → 3-way
    // join → (pid) re-aggregate — two exchanges and a join chain over
    // panel-bounded frames, ~6 of this query's 22 stage-jobs. The
    // feedback vector q' = nr·qv(probe) + Σ qv(retrieved) is an
    // order-free elementwise INTEGER sum of ≤ PrfK retrieved arrays, so
    // it folds per probe: collect the retrieved quantized vectors and
    // zip_with-accumulate onto nr·qv(probe). Identical per-dim BIGINT
    // values, identical FLOAT cast — the oracle certifies it.
    val retr = pass1
      .join(emb64.select(col("vec_id").as("nid"), col("embedding")), "nid")
      .groupBy(col("pid"))
      .agg(collect_list(
        VectorOps.quantize(col("embedding"), ReleaseOps.EmbQScale))
        .as("arrs"), count(lit(1)).as("nr"))
    val fbVec = retr
      .join(probes.select(col("pid"),
        VectorOps.quantize(col("pe"), ReleaseOps.EmbQScale).as("qpe")), "pid")
      .select(col("pid"), expr(
        """transform(
          |  aggregate(arrs, transform(qpe, x -> nr * x),
          |    (acc, a) -> zip_with(acc, a, (u, v) -> u + v)),
          |  v -> CAST(v AS FLOAT))""".stripMargin).as("pe2"))
    val pass2 = topK(broadcast(fbVec).crossJoin(cands)
      .filter(col("nid") =!= col("pid"))
      .select(col("pid"), col("nid"), col("nlabel"),
        floor(VectorOps.cosineNative(col("pe2"), col("ce")) * 1000000d)
          .cast("long").as("sm")))
    val labCnt = emb64.groupBy(col("label"))
      .agg(count(lit(1)).as("lab_n"))
    val before = pass1.groupBy(col("pid"))
      .agg(max(col("plabel")).as("label"),
        sum(when(col("nlabel") === col("plabel"), 1L).otherwise(0L))
          .as("hits_before"))
    // NOT broadcast (r16 audit): every frame here is panel- or
    // label-domain-bounded on BOTH sides, so the sort-merge joins are
    // trivial at any scale while broadcast hints each add a separate
    // build job — measured as a net loss in the sweep.
    val after = pass2
      .join(probes.select(col("pid"), col("plabel")), "pid")
      .groupBy(col("pid"))
      .agg(sum(when(col("nlabel") === col("plabel"), 1L).otherwise(0L))
        .as("hits_after"))
    before.join(after, "pid")
      .join(labCnt, "label")
      .select(col("pid").as("probe_id"), col("label"),
        (col("lab_n") - 1L).as("n_rel"),
        col("hits_before"), col("hits_after"),
        (col("hits_after") - col("hits_before")).as("delta_hits"))
      .orderBy(col("probe_id"))
  }

  val q248Oracle: String = {
    val qexpr = s"list_transform(embedding, e -> " +
      s"CAST(floor(CAST(e AS DOUBLE) * ${ReleaseOps.EmbQScale}) AS BIGINT))"
    s"""WITH emb64 AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding
       |  FROM embeddings WHERE len(embedding) = 64),
       |probes AS (
       |  SELECT vec_id AS pid, label AS plabel, embedding AS pe
       |  FROM emb64 WHERE vec_id % $PrfPanelMod = 0
       |    AND vec_id < $PrfPanelMax),
       |pairs AS (
       |  SELECT p.pid, c.vec_id AS nid, p.pe, c.embedding AS ne
       |  FROM probes p, emb64 c WHERE c.vec_id <> p.pid),
       |${Similarity.cosineCtes("pairs", "s1")},
       |r1 AS (
       |  SELECT pid, nid,
       |         row_number() OVER (PARTITION BY pid
       |             ORDER BY CAST(floor(sim * 1000000) AS BIGINT) DESC, nid)
       |           AS rnk
       |  FROM s1),
       |top1 AS (SELECT pid, nid FROM r1 WHERE rnk <= $PrfK),
       |q AS (SELECT vec_id, $qexpr AS qv FROM emb64),
       |fb AS (
       |  SELECT t.pid, generate_subscripts(q.qv, 1) AS d,
       |         unnest(q.qv) AS x
       |  FROM top1 t JOIN q ON q.vec_id = t.nid),
       |fbs AS (
       |  SELECT pid, d, CAST(sum(x) AS BIGINT) AS s
       |  FROM fb GROUP BY pid, d),
       |nret AS (SELECT pid, count(*) AS nr FROM top1 GROUP BY pid),
       |pd AS (
       |  SELECT p.pid, generate_subscripts(q.qv, 1) AS d,
       |         unnest(q.qv) AS px
       |  FROM probes p JOIN q ON q.vec_id = p.pid),
       |q2 AS (
       |  SELECT pd.pid, pd.d, nret.nr * pd.px + fbs.s AS v
       |  FROM pd JOIN fbs ON pd.pid = fbs.pid AND pd.d = fbs.d
       |  JOIN nret ON pd.pid = nret.pid),
       |q2l AS (
       |  SELECT pid, list(CAST(v AS DOUBLE) ORDER BY d) AS pe2
       |  FROM q2 GROUP BY pid),
       |pairs2 AS (
       |  SELECT l.pid, c.vec_id AS nid, l.pe2 AS pe, c.embedding AS ne
       |  FROM q2l l, emb64 c WHERE c.vec_id <> l.pid),
       |${Similarity.cosineCtes("pairs2", "s2")},
       |r2 AS (
       |  SELECT pid, nid,
       |         row_number() OVER (PARTITION BY pid
       |             ORDER BY CAST(floor(sim * 1000000) AS BIGINT) DESC, nid)
       |           AS rnk
       |  FROM s2),
       |top2 AS (SELECT pid, nid FROM r2 WHERE rnk <= $PrfK),
       |lab AS (SELECT vec_id, label FROM emb64),
       |labcnt AS (SELECT label, count(*) AS lab_n FROM emb64 GROUP BY label),
       |bef AS (
       |  SELECT t.pid, any_value(p.plabel) AS label,
       |         CAST(sum(CASE WHEN l.label = p.plabel THEN 1 ELSE 0 END)
       |              AS BIGINT) AS hits_before
       |  FROM top1 t JOIN probes p ON t.pid = p.pid
       |  JOIN lab l ON t.nid = l.vec_id GROUP BY t.pid),
       |aft AS (
       |  SELECT t.pid,
       |         CAST(sum(CASE WHEN l.label = p.plabel THEN 1 ELSE 0 END)
       |              AS BIGINT) AS hits_after
       |  FROM top2 t JOIN probes p ON t.pid = p.pid
       |  JOIN lab l ON t.nid = l.vec_id GROUP BY t.pid)
       |SELECT b.pid AS probe_id, b.label, c.lab_n - 1 AS n_rel,
       |       b.hits_before, a.hits_after,
       |       a.hits_after - b.hits_before AS delta_hits
       |FROM bef b JOIN aft a ON b.pid = a.pid
       |JOIN labcnt c ON b.label = c.label
       |ORDER BY probe_id""".stripMargin
  }

  // ---------------------------------------------------------------- q249

  /** Sampling-table vocabulary bound and the audit's draw count. */
  val NegVocab = 1000
  val NegDraws = 10000L

  /** q249: word2vec NEGATIVE-SAMPLING table — the unigram^(3/4)
    * distribution (Mikolov et al. 2013, arXiv:1310.4546 §2.2) every
    * skip-gram/contrastive text trainer draws its negatives from,
    * built over the top-[[NegVocab]] vocabulary, PLUS the audit that
    * the table is actually drawable: [[NegDraws]] deterministic h60
    * draws mapped through the cumulative table, with per-token target
    * vs sampled permille. c^0.75 is computed as sqrt(c·sqrt(c)) — two
    * correctly-rounded IEEE sqrts and one multiplication, so both
    * engines produce the bit-identical double where a libm pow() need
    * not — then floor-quantized to the integer weight the table sums
    * (the q204 ranking-key discipline applied to a sampling weight).
    *
    * Scale shape: one corpus scan → token counts (map-side partial);
    * the table, cumsum, draws (engine-generated range — constant
    * [[NegDraws]] at any corpus size), and the range-assignment join
    * all run on the ≤ [[NegVocab]]-row frame. Output: the top 20
    * rows of the table with their drawn frequencies.
    */
  def q249(spark: SparkSession, dir: String): DataFrame = {
    val top = table(spark, dir, "documents")
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))))
      .filter(col("rnk") <= NegVocab)
      .withColumn("w_q",
        floor(sqrt(col("cnt").cast("double") *
          sqrt(col("cnt").cast("double"))) * 1000d).cast("long"))
    val wc = Window.orderBy(col("rnk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tab = top
      .withColumn("hi", sum(col("w_q")).over(wc))
      .withColumn("lo", col("hi") - col("w_q"))
      .localCheckpoint() // bounded (NegVocab rows); draws + total + report read it
    val total = tab.agg(max(col("hi")).as("total"))
    val draws = spark.range(NegDraws).toDF("i")
      .crossJoin(broadcast(total))
      .select((CrossHash.h60(concat(lit("negdraw:"), col("i").cast("string")))
        % col("total")).as("u"))
    val sampled = draws.join(tab,
        col("u") >= col("lo") && col("u") < col("hi"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_sampled"))
    tab.crossJoin(broadcast(total))
      .join(sampled, Seq("token"), "left")
      .filter(col("rnk") <= 20)
      .select(col("token"), col("cnt"), col("w_q"),
        expr("(1000 * w_q) div total").as("target_permille"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        expr(s"(1000 * coalesce(n_sampled, 0)) div $NegDraws")
          .as("sampled_permille"))
      .orderBy(col("cnt").desc, col("token"))
  }

  val q249Oracle: String = {
    val h = CrossHash.h60Sql("'negdraw:' || CAST(i AS VARCHAR)")
    s"""WITH tok AS (
       |  SELECT unnest(list_filter(string_split(text, ' '),
       |                t -> t <> '')) AS token
       |  FROM documents),
       |cnts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
       |top AS (
       |  SELECT token, cnt,
       |         row_number() OVER (ORDER BY cnt DESC, token) AS rnk,
       |         CAST(floor(sqrt(CAST(cnt AS DOUBLE) *
       |                sqrt(CAST(cnt AS DOUBLE))) * 1000) AS BIGINT) AS w_q
       |  FROM cnts QUALIFY rnk <= $NegVocab),
       |tab AS (
       |  SELECT token, cnt, rnk, w_q,
       |         CAST(sum(w_q) OVER (ORDER BY rnk
       |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
       |  FROM top),
       |tot AS (SELECT max(hi) AS total FROM tab),
       |draws AS (
       |  SELECT $h % (SELECT total FROM tot) AS u
       |  FROM range($NegDraws) r(i)),
       |assigned AS (
       |  SELECT t.token, count(*) AS n_sampled
       |  FROM draws d JOIN tab t ON d.u >= t.hi - t.w_q AND d.u < t.hi
       |  GROUP BY t.token)
       |SELECT t.token, t.cnt, t.w_q,
       |       (1000 * t.w_q) // (SELECT total FROM tot) AS target_permille,
       |       CAST(COALESCE(a.n_sampled, 0) AS BIGINT) AS n_sampled,
       |       (1000 * COALESCE(a.n_sampled, 0)) // $NegDraws
       |         AS sampled_permille
       |FROM tab t LEFT JOIN assigned a ON t.token = a.token
       |WHERE t.rnk <= 20
       |ORDER BY t.cnt DESC, t.token""".stripMargin
  }


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
      .localCheckpoint() // ONE corpus pass; pool_arr + both ps sides read it
    // OPTIMIZATION r17 (guide §2.4; ADVICE r16 item 3): poolEmb is
    // panel-bounded (≤ panel × MmrPoolK rows + their embeddings) and is
    // consumed by BOTH sides of the ps self-join. The r16 shape relied
    // on planner ReuseExchange to evaluate it once, which was
    // NONDETERMINISTIC (2 or 4 embeddings scans depending on session
    // history — the loosened test gate ADVICE r16 flagged). One
    // checkpoint makes it exactly one join-back scan, always, and the
    // self-join reads materialized blocks; the 4-scan worst case is
    // structurally impossible now, and PlanShapeSpec pins the consumer
    // at zero parquet scans deterministically.
    val poolEmb = pool.join(
      emb64.select(col("vec_id").as("nid"), col("embedding").as("ne")),
      "nid")
      .localCheckpoint()
    val ps = poolEmb.as("a")
      .join(poolEmb.as("b"),
        col("a.pid") === col("b.pid") && col("a.nid") =!= col("b.nid"))
      .select(col("a.pid").as("pid"), col("a.nid").as("na"),
        col("b.nid").as("nb"),
        floor(VectorOps.cosineNative(col("a.ne"), col("b.ne")) * 1000000d)
          .cast("long").as("sm"))
    // OPTIMIZATION r16 (guide §2.4, §1.2 "the distributed algorithm"):
    // the greedy rounds used to run as an unrolled Spark loop — per
    // round a pen join + groupBy, a left_anti join, a window and a
    // localCheckpoint (~45 tiny AQE stage-jobs at any scale, all on
    // panel-bounded frames). The panel contract (≤50 probes × MmrPoolK
    // candidates) means the ENTIRE greedy trace fits one row per probe:
    // collect each probe's pool (≤20 structs) and pair-sim list (≤380
    // structs), then compute the full [[MmrSelK]]-round argmax fold in
    // one `aggregate` higher-order expression — same integer scores,
    // same (score2 desc, nid) tie-break, same inner-pen semantics
    // (every candidate has a pair sim to every selected member by
    // construction of ps). Interpreted-lambda cost is bounded by the
    // panel, never the corpus; the corpus still pays exactly one
    // cosine+top-k pass (`pool` above). 53 jobs -> ~10.
    val poolArr = pool.groupBy(col("pid"))
      .agg(expr("array_sort(collect_list(struct(-smq AS negs, nid, smq)))")
        .as("parr"))
    val simArr = ps.groupBy(col("pid"))
      .agg(collect_list(struct(col("na"), col("nb"), col("sm"))).as("sarr"))
    // sarr0: a probe whose pool has a single member has NO pair sims —
    // the left join + empty-array default reproduces the old inner-pen
    // semantics (rounds 2+ pick nothing; round 1 still emits)
    val selExpr =
      s"""aggregate(
         |  sequence(2, $MmrSelK),
         |  array(named_struct(
         |    'rnd', CAST(1 AS BIGINT), 'nid', parr[0].nid,
         |    'smq', parr[0].smq, 'score2', parr[0].smq)),
         |  (acc, r) -> concat(acc, transform(
         |    slice(array_sort(filter(transform(
         |      filter(parr, c -> NOT exists(acc, a -> a.nid = c.nid)),
         |      c -> named_struct(
         |        'negs2', -(c.smq - array_max(transform(
         |          filter(sarr0, s -> s.na = c.nid
         |            AND exists(acc, a -> a.nid = s.nb)),
         |          s -> s.sm))),
         |        'nid', c.nid, 'smq', c.smq)),
         |      b -> b.negs2 IS NOT NULL)), 1, 1),
         |    b -> named_struct(
         |      'rnd', CAST(r AS BIGINT), 'nid', b.nid,
         |      'smq', b.smq, 'score2', -b.negs2))))""".stripMargin
    // NOT broadcast (r16 audit, pinned by PlanShapeSpec): wrapping
    // simArr in a BroadcastExchange detaches the ps self-join from the
    // exchange-reuse that evaluates poolEmb once — measured as 2 -> 4
    // embeddings scans. The top-level join frames are ≤ |panel| rows;
    // its sort-merge costs nothing at any scale.
    poolArr.join(simArr, Seq("pid"), "left")
      .withColumn("sarr0", expr("ifnull(sarr, cast(array() as " +
        "array<struct<na:bigint,nb:bigint,sm:bigint>>))"))
      .select(col("pid"), explode(expr(selExpr)).as("e"))
      .select(col("pid").as("probe_id"), col("e.rnd").as("rnd"),
        col("e.nid").as("picked_id"), col("e.smq").as("sim_micro"),
        col("e.score2").as("mmr_micro"))
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
       |-- per-vector DOUBLE cosine fold of 64 unit-scale terms — not an
       |-- int64 moment, no overflow budget applies
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

  // ---------------------------------------------------------------- q163

  /** RRF constant (the standard k = 60 from the Cormack/Clarke/Buettcher
    * fusion formula) and the scaled-reciprocal numerator: the fused score
    * is Σ 10⁶ DIV (60 + rank) — a BIGINT both engines compute
    * bit-identically, monotone in the real 1/(60+r).
    */
  val RrfK = 60
  val RrfScale = 1000000L

  /** Probe vector id for the dense side and its top-list size. */
  val RrfProbeId = 0L
  val RrfSemK = 10

  /** Rows returned by the fused ranking. */
  val RrfTop = 15

  /** q163: hybrid lexical+dense retrieval via reciprocal-rank fusion.
    * The lexical list is EXACTLY q105's top-[[RetrievalOps.BmK]] BM25
    * result (reused, not re-derived — one implementation, two
    * consumers); the dense list is the cosine top-[[RrfSemK]] around
    * probe [[RrfProbeId]] ranked on `floor(sim·10⁶)` with vec_id
    * tie-break (q19's cross-engine ranking discipline, floor-quantized
    * per the round-6 rule). A full-outer join on the doc id fuses the
    * two lists: each side contributes 10⁶ DIV (60 + rank), a missing
    * side contributes 0.
    *
    * Scale shape: both inputs are top-k lists (≤ 10 rows each) — the
    * fusion join, window ranks, and final sort all run on broadcast-
    * sized frames. The corpus-scale work is exactly q105's one
    * posting-pruned pass plus q19's one narrow cosine pass; fusion
    * adds nothing data-sized. At 100 TB the two retrieval legs run as
    * independent index scans and the RRF join stays a driver-trivial
    * merge of two k-row lists.
    */
  def q163(spark: SparkSession, dir: String): DataFrame = {
    val lex = RetrievalOps.q105(spark, dir)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("lex_rank"))

    val emb = table(spark, dir, "embeddings")
    val probe = emb.filter(col("vec_id") === RrfProbeId)
      .select(col("embedding").as("pe"))
    val sem = emb.filter(col("vec_id") =!= RrfProbeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        floor(VectorOps.cosineNative(col("pe"), col("embedding")) * lit(1000000d))
          .cast("long").as("qsim"))
      .withColumn("sem_rank", row_number().over(
        Window.orderBy(col("qsim").desc, col("vec_id"))).cast("long"))
      .filter(col("sem_rank") <= RrfSemK)
      .select(col("vec_id").as("id"), col("sem_rank"))

    lex.join(sem, Seq("id"), "full_outer")
      .select(col("id"), col("lex_rank"), col("sem_rank"),
        (coalesce(expr(s"$RrfScale DIV ($RrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"$RrfScale DIV ($RrfK + sem_rank)"), lit(0L)))
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(RrfTop)
  }

  /** The lexical leg nests [[RetrievalOps.q105Oracle]] verbatim as a
    * derived table (DuckDB allows a WITH inside a FROM subquery), so
    * the BM25 semantics cannot drift between q105 and q163.
    */
  lazy val q163Oracle: String =
    s"""WITH lex AS (
       |  SELECT doc_id AS id,
       |         row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
       |  FROM (${RetrievalOps.q105Oracle.replace("\n", "\n       ")}) q105),
       |pairs AS (
       |  SELECT p.vec_id AS pid, c.vec_id AS nid,
       |         p.embedding AS pe, c.embedding AS ne
       |  FROM embeddings p, embeddings c
       |  WHERE p.vec_id = $RrfProbeId AND c.vec_id <> $RrfProbeId),
       |un AS (
       |  SELECT pid, nid, CAST(unnest(pe) AS DOUBLE) AS x,
       |         CAST(unnest(ne) AS DOUBLE) AS y
       |  FROM pairs),
       |sims AS (
       |  SELECT nid,
       |         CAST(floor(1000000 * sum(x * y) /
       |           (sqrt(sum(x * x)) * sqrt(sum(y * y)))) AS BIGINT) AS qsim
       |  FROM un GROUP BY nid),
       |sem AS (
       |  SELECT nid AS id, sem_rank FROM (
       |    SELECT nid, row_number() OVER (ORDER BY qsim DESC, nid) AS sem_rank
       |    FROM sims) r
       |  WHERE sem_rank <= $RrfSemK)
       |SELECT coalesce(lex.id, sem.id) AS id,
       |       lex.lex_rank, sem.sem_rank,
       |       coalesce($RrfScale // ($RrfK + lex.lex_rank), 0) +
       |         coalesce($RrfScale // ($RrfK + sem.sem_rank), 0) AS rrf_score
       |FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
       |ORDER BY rrf_score DESC, id LIMIT $RrfTop""".stripMargin

  // ---------------------------------------------------------------- q104

  /** Capped inverted-index construction: for every term with document
    * frequency ≥ [[IdxMinDf]], emit (term, df, first [[IdxPostCap]]
    * doc_ids ascending). The posting cap is the point — a retrieval
    * index ships bounded postings per shard, and an uncapped
    * collect_list over a Zipf head term is the classic executor OOM.
    *
    * Scale shape: per-document term dedup happens map-side
    * (array_distinct before explode — no (doc, term) distinct shuffle);
    * df is one partial+final aggregate; the posting rank is a
    * row_number ≤ cap, so WindowGroupLimit forwards at most `cap` rows
    * per term per map partition to the exchange and the collect_list
    * state is ≤ cap entries per term BY CONSTRUCTION.
    */
  val IdxMinDf = 25
  val IdxPostCap = 8

  def q104(spark: SparkSession, dir: String): DataFrame = {
    val pairs = table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr(
          "array_distinct(filter(split(text, ' '), t -> t <> ''))"))
          .as("term"))
    val dfreq = pairs.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= IdxMinDf)
    val postings = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("doc_id"))))
      .filter(col("rn") <= IdxPostCap)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postingArr"))
    // The posting list is emitted as a space-joined string, not a raw
    // array column: the output contract is scalar-only columns so any
    // row-set comparator (hash, sort, pandas) can digest it. The
    // array-form semantics (sorted, capped, distinct) are pinned by
    // RetrievalPrimitivesSpec against the split of this string.
    dfreq.join(postings, "term")
      .select(col("term"), col("df"),
        array_join(col("postingArr"), " ").as("posting"))
      .orderBy(col("term"))
  }

  val q104Oracle: String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT doc_id, tok AS term FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents) t
       |  WHERE tok <> ''),
       |df AS (
       |  SELECT term, count(*) AS df FROM pairs
       |  GROUP BY term HAVING count(*) >= $IdxMinDf),
       |rk AS (
       |  SELECT term, doc_id,
       |         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM pairs),
       |pl AS (
       |  SELECT term,
       |         array_to_string(list(doc_id ORDER BY doc_id), ' ') AS posting
       |  FROM rk WHERE rn <= $IdxPostCap GROUP BY term)
       |SELECT df.term, df.df, pl.posting
       |FROM df JOIN pl USING (term) ORDER BY df.term""".stripMargin

  // ---------------------------------------------------------------- q105

  /** Integer-quantized BM25 retrieval: top-[[BmK]] documents for a
    * fixed conjunctive-OR term query. With k1 = 1.2, b = 0.75 the
    * per-term score tf·(k1+1)·idf / (tf + k1·(1−b+b·dl/avgdl)) clears
    * to the integer rational
    *
    *   s_q = (22 · tf · avgdl · idf_q) DIV (10·avgdl·tf + 3·avgdl + 9·dl)
    *
    * with idf_q = (10⁴·N) DIV df (q97's quantized-idf discipline —
    * monotone in the real idf, reproducible everywhere), so the ranking
    * key sum(s_q) is a BIGINT both engines compute bit-identically.
    * Overflow is guarded in-expression (q84/q97 pattern): the numerator
    * must stay < 2⁶², i.e. tf·idf_q < 2⁶²/(22·avgdl) — breach raises,
    * never wraps.
    *
    * Scale shape: the term filter prunes the explode to the query
    * vocabulary BEFORE the (doc, term) aggregate, so no shuffle ever
    * carries more than the matching postings; df (≤ |query| rows) and
    * the corpus stats (1 row) broadcast; top-k is
    * TakeOrderedAndProject. The plan reads the corpus once for tf and
    * once each for the df/avgdl statistics — self-contained here so the
    * oracle gates the whole computation; a production deployment serves
    * (N, avgdl, df) from index metadata (one precomputed aggregate,
    * reused by every query), making the per-query cost a single scan.
    */
  val BmTerms: Seq[String] = Seq("data", "join", "stream", "filter")
  val BmK = 10

  def q105(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val stats = docs
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tok_sum"))
      .select(col("n_docs"), expr("tok_sum DIV n_docs").as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(BmTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_q", expr("(10000 * n_docs) DIV df"))
      // guard arithmetic must itself be overflow-free in ANY mode: the
      // threshold is a pure integer-division chain (never multiplies
      // user-scaled values), conservative by one floor step — it can
      // raise a hair early, never late, and never wraps
      .withColumn("s_q",
        when(col("tf") >
            expr("4611686018427387904 DIV (22 * avgdl) DIV idf_q"),
          raise_error(lit("q105: tf*idf_q breaches the 2^62 score budget"))
            .cast("long"))
          .otherwise(expr(
            "(22 * tf * avgdl * idf_q) DIV (10 * avgdl * tf + 3 * avgdl + 9 * dl)")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s_q")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(BmK)
      .select(col("doc_id"), col("n_terms"), col("score"))
  }

  val q105Oracle: String = {
    val termList = BmTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents),
       |dd AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
       |  FROM d WHERE len(toks) > 0),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) // count(*) AS avgdl
       |  FROM dd),
       |tf AS (
       |  SELECT doc_id, dl, tok AS term, count(*) AS tf FROM (
       |    SELECT doc_id, dl, unnest(toks) AS tok FROM dd) t
       |  WHERE tok IN ($termList) GROUP BY doc_id, dl, tok),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc AS (
       |  SELECT tf.doc_id,
       |         (22 * tf.tf * s.avgdl * ((10000 * s.n_docs) // df.df))
       |           // (10 * s.avgdl * tf.tf + 3 * s.avgdl + 9 * tf.dl) AS s_q
       |  FROM tf JOIN df USING (term) CROSS JOIN stats s)
       |SELECT doc_id, count(*) AS n_terms, CAST(sum(s_q) AS BIGINT) AS score
       |FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $BmK""".stripMargin
  }

  // ---------------------------------------------------------------- q126

  /** Docs returned by the phrase search. */
  val PhraseTop = 50

  /** Positional phrase search — the retrieval primitive q104's postings
    * and q105's ranking both lack: CONSECUTIVE-position matching. The
    * query phrase is derived from the corpus itself (its most frequent
    * bigram under the total order count DESC, w1, w2 — so the query is
    * deterministic and always has hits at every SF), then every
    * occurrence is located and docs are ranked by occurrence count.
    *
    * Scale shape: adjacent pairs come from an index-HOF over the token
    * array (`transform(sequence(...))` — NARROW, no per-doc window
    * shuffle; the bigram sits next to its 1-based position before any
    * explode). Pass 1 aggregates bigram counts (the stats a real
    * positional index precomputes); pass 2 re-derives pairs and prunes
    * to the broadcast 1-row phrase IMMEDIATELY after the narrow
    * explode, so the only shuffle carries matching occurrences. Top
    * docs via TakeOrderedAndProject.
    */
  def q126(spark: SparkSession, dir: String): DataFrame = {
    def pairs(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(cast(i as bigint) as pos," +
          " toks[i-1] as w1, toks[i] as w2))")).as("p"))
      .select(col("doc_id"), col("p.pos"), col("p.w1"), col("p.w2"))
    val docs = table(spark, dir, "documents")
    val phrase = pairs(docs)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(1)
      .select(col("w1"), col("w2"))
    pairs(docs)
      .join(broadcast(phrase), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
      .orderBy(col("n_occ").desc, col("doc_id"))
      .limit(PhraseTop)
  }

  val q126Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t WHERE tok <> ''),
       |seq AS (
       |  SELECT doc_id, tok,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos
       |  FROM toks),
       |bp AS (
       |  SELECT doc_id, pos, tok AS w1, lead(tok) OVER w AS w2
       |  FROM seq WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |bg AS (SELECT * FROM bp WHERE w2 IS NOT NULL),
       |top1 AS (
       |  SELECT w1, w2 FROM (
       |    SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2)
       |  ORDER BY c DESC, w1, w2 LIMIT 1)
       |SELECT doc_id, count(*) AS n_occ,
       |       CAST(min(pos) AS BIGINT) AS first_pos
       |FROM bg JOIN top1 USING (w1, w2)
       |GROUP BY doc_id
       |ORDER BY n_occ DESC, doc_id LIMIT $PhraseTop""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q248_rocchio_prf" -> (q248 _),
    "q249_negative_sampling" -> (q249 _),
    "q250_mmr_rerank" -> (q250 _),
    "q251_label_noise" -> (q251 _),
    "q163_rrf_fusion" -> (q163 _),
    "q104_inverted_index" -> (q104 _),
    "q105_bm25" -> (q105 _),
    "q126_phrase_search" -> (q126 _))

  val oracles: Map[String, String] = Map(
    "q248_rocchio_prf" -> q248Oracle,
    "q249_negative_sampling" -> q249Oracle,
    "q250_mmr_rerank" -> q250Oracle,
    "q251_label_noise" -> q251Oracle,
    "q163_rrf_fusion" -> q163Oracle,
    "q104_inverted_index" -> q104Oracle,
    "q105_bm25" -> q105Oracle,
    "q126_phrase_search" -> q126Oracle)
}
