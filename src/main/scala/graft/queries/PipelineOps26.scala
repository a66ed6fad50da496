package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.{CrossHash, VectorOps}

/** Round-10 pack #14: the deterministic PERMUTATION two-sample test for
  * embedding distributions (q259) — did the vector distribution drift,
  * with a significance call, not just a mean delta.
  */
object PipelineOps26 {

  /** Panel id bound (≤ ~100 vectors per side at any corpus size — the
    * q19/q228 fixed-panel rule), permutation count (p resolution
    * 1000/(1+99) = 10‰), and the two-sided significance level. */
  val EdPanelMax = 400L
  val EdPerms = 99
  val EdAlphaPermille = 50L

  /** q259: ENERGY-DISTANCE permutation test (Székely & Rizzo 2004) —
    * the two-sample readout the drift family lacks: q119 compares
    * MEANS (a distribution can rotate, split, or spread without moving
    * its mean), KS/TVD (q209/q117) are univariate; energy distance
    * E = 2·E‖a−b‖ − E‖a−a′‖ − E‖b−b′‖ is zero iff the two
    * DISTRIBUTIONS are equal, and the permutation null needs no
    * distributional assumption at all. Two panel comparisons ship:
    * `parity` (id % 4 = 1 vs 2 — same distribution by construction,
    * the null the test must NOT reject) and `label01` (class 0 vs 1 —
    * whatever structure the labels actually carry; on the synthetic
    * corpus they carry none, so both gates pin the null path and the
    * spec's shifted-fixture corpus pins the rejection path, the
    * q253/q254 regime pattern).
    *
    * Everything is deterministic cross-engine: distances are
    * floor(IEEE √) of exact int64 quantized d² (the q165 isqrt
    * discipline), the statistic is milli-quantized per term
    * (2000·S div n(n−1) — identical floor on both engines), and the
    * [[EdPerms]] permutations are h60-derived rank splits (no RNG
    * anywhere), so the p-value itself is under the hash gate.
    *
    * Scale shape: panels are FIXED (≤ ~200 members per comparison at
    * any corpus size), so the pair matrix (≤ 2·C(200,2) rows), the
    * (1+perms)×members assignment frame, and their join (~4M rows)
    * are all constant-sized; the corpus contributes one pruned scan.
    * p_permille = 1000·(1 + #{E′ ≥ E}) div (1 + perms) — the standard
    * add-one permutation p (the observed split is its own 0th member).
    */
  def q259(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .filter(size(col("embedding")) === 64 && col("vec_id") < EdPanelMax)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        VectorOps.quantize(col("embedding"), PipelineOps9.EmbQScale)
          .as("qv"))
    val members = emb
      .filter(col("vec_id") % 4 === 1 || col("vec_id") % 4 === 2)
      .select(lit("parity").as("cmp"),
        when(col("vec_id") % 4 === 1, "A").otherwise("B").as("grp"),
        col("vec_id"), col("qv"))
      .unionByName(emb.filter(col("label").isin(0L, 1L))
        .select(lit("label01").as("cmp"),
          when(col("label") === 0L, "A").otherwise("B").as("grp"),
          col("vec_id"), col("qv")))
      .localCheckpoint() // ≤ ~400 rows; pairs + assignments + sizes read it
    val pairs = members.as("a")
      .join(members.as("b"),
        col("a.cmp") === col("b.cmp") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cmp").as("cmp"), col("a.vec_id").as("va"),
        col("b.vec_id").as("vb"),
        floor(sqrt(VectorOps.intSqDist(col("a.qv"), col("b.qv"))
          .cast("double"))).cast("long").as("d"))
      .localCheckpoint() // ≤ 2·C(200,2) rows; joined once per endpoint
    val nA = members.filter(col("grp") === "A")
      .groupBy(col("cmp")).agg(count(lit(1)).as("n_a"))
    // permutation p ≥ 1: rank the comparison's members by a salted h60
    // and hand the first n_a ranks to A — a uniform size-preserving
    // relabeling; p = 0 is the OBSERVED grouping
    val wr = Window.partitionBy(col("cmp"), col("p"))
      .orderBy(col("h"), col("vec_id"))
    val assign = members.select(col("cmp"), col("grp"), col("vec_id"))
      .crossJoin(spark.range(1L, EdPerms + 1L).toDF("p"))
      .withColumn("h", CrossHash.h60(concat(lit("ed:"), col("cmp"),
        lit(":"), col("p").cast("string"), lit(":"),
        col("vec_id").cast("string"))))
      .withColumn("rk", row_number().over(wr))
      .join(broadcast(nA), "cmp")
      .select(col("cmp"), col("p"), col("vec_id"),
        when(col("rk") <= col("n_a"), "A").otherwise("B").as("pg"))
      .unionByName(members.select(col("cmp"), lit(0L).as("p"),
        col("vec_id"), col("grp").as("pg")))
    val stats = pairs
      .join(assign.select(col("cmp"), col("p"), col("vec_id").as("va"),
        col("pg").as("ga")), Seq("cmp", "va"))
      .join(assign.select(col("cmp"), col("p"), col("vec_id").as("vb"),
        col("pg").as("gb")), Seq("cmp", "p", "vb"))
      .groupBy(col("cmp"), col("p"))
      .agg(
        sum(when(col("ga") =!= col("gb"), col("d")).otherwise(0L)).as("sab"),
        sum(when(col("ga") === "A" && col("gb") === "A", col("d"))
          .otherwise(0L)).as("saa"),
        sum(when(col("ga") === "B" && col("gb") === "B", col("d"))
          .otherwise(0L)).as("sbb"))
    val sizes = members.groupBy(col("cmp")).agg(
      sum(when(col("grp") === "A", 1L).otherwise(0L)).as("na"),
      sum(when(col("grp") === "B", 1L).otherwise(0L)).as("nb"))
    // nullif guards (the q233/q237 discipline): a degenerate one-member
    // or empty side makes a within/between term NULL → NULL e_milli,
    // not an engine-dependent division-by-zero
    val es = stats.join(broadcast(sizes), "cmp")
      .withColumn("e_milli",
        expr("(2000 * sab) div nullif(na * nb, 0) - (2000 * saa) div" +
          " nullif(na * (na - 1), 0) - (2000 * sbb) div" +
          " nullif(nb * (nb - 1), 0)"))
    val obs = es.filter(col("p") === 0)
      .select(col("cmp"), col("e_milli").as("e_obs_milli"))
    es.filter(col("p") > 0)
      .join(broadcast(obs), "cmp")
      .groupBy(col("cmp"), col("na"), col("nb"), col("e_obs_milli"))
      .agg(sum(when(col("e_milli") >= col("e_obs_milli"), 1L)
        .otherwise(0L)).as("n_ge"))
      .withColumn("p_permille",
        expr(s"(1000 * (1 + n_ge)) div ${1 + EdPerms}"))
      .withColumn("significant", col("p_permille") <= EdAlphaPermille)
      .select(col("cmp"), col("na").as("n_a"), col("nb").as("n_b"),
        col("e_obs_milli"), col("n_ge"), col("p_permille"),
        col("significant"))
      .orderBy(col("cmp"))
  }

  val q259Oracle: String = {
    val h = CrossHash.h60Sql(
      "'ed:' || cmp || ':' || CAST(p AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)")
    s"""WITH emb AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label,
       |         list_transform(embedding, e ->
       |           CAST(floor(CAST(e AS DOUBLE) * ${PipelineOps9.EmbQScale})
       |                AS BIGINT)) AS qv
       |  FROM embeddings
       |  WHERE len(embedding) = 64 AND vec_id < $EdPanelMax),
       |members AS (
       |  SELECT 'parity' AS cmp,
       |         CASE WHEN vec_id % 4 = 1 THEN 'A' ELSE 'B' END AS grp,
       |         vec_id, qv
       |  FROM emb WHERE vec_id % 4 IN (1, 2)
       |  UNION ALL
       |  SELECT 'label01' AS cmp,
       |         CASE WHEN label = 0 THEN 'A' ELSE 'B' END AS grp,
       |         vec_id, qv
       |  FROM emb WHERE label IN (0, 1)),
       |pairs AS MATERIALIZED (
       |  SELECT a.cmp, a.vec_id AS va, b.vec_id AS vb,
       |         CAST(floor(sqrt(CAST(list_sum(list_transform(range(1, 65),
       |             i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
       |           AS DOUBLE))) AS BIGINT) AS d
       |  FROM members a JOIN members b
       |    ON a.cmp = b.cmp AND a.vec_id < b.vec_id),
       |nA AS (
       |  SELECT cmp, count(*) AS n_a FROM members
       |  WHERE grp = 'A' GROUP BY cmp),
       |assign AS MATERIALIZED (
       |  SELECT cmp, p, vec_id,
       |         CASE WHEN row_number() OVER (
       |                PARTITION BY cmp, p
       |                ORDER BY $h, vec_id) <= n_a
       |              THEN 'A' ELSE 'B' END AS pg
       |  FROM (
       |    SELECT m.cmp AS cmp, g.p AS p, m.vec_id AS vec_id, nA.n_a
       |    FROM (SELECT cmp, vec_id FROM members) m
       |    CROSS JOIN (SELECT unnest(range(1, ${EdPerms + 1})) AS p) g
       |    JOIN nA ON m.cmp = nA.cmp)
       |  UNION ALL
       |  SELECT cmp, 0 AS p, vec_id, grp AS pg FROM members),
       |stats AS (
       |  SELECT pr.cmp, a1.p,
       |         CAST(sum(CASE WHEN a1.pg <> a2.pg THEN pr.d ELSE 0 END)
       |              AS BIGINT) AS sab,
       |         CAST(sum(CASE WHEN a1.pg = 'A' AND a2.pg = 'A'
       |                       THEN pr.d ELSE 0 END) AS BIGINT) AS saa,
       |         CAST(sum(CASE WHEN a1.pg = 'B' AND a2.pg = 'B'
       |                       THEN pr.d ELSE 0 END) AS BIGINT) AS sbb
       |  FROM pairs pr
       |  JOIN assign a1 ON a1.cmp = pr.cmp AND a1.vec_id = pr.va
       |  JOIN assign a2 ON a2.cmp = pr.cmp AND a2.vec_id = pr.vb
       |    AND a2.p = a1.p
       |  GROUP BY pr.cmp, a1.p),
       |sizes AS (
       |  SELECT cmp,
       |         CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS na,
       |         CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS nb
       |  FROM members GROUP BY cmp),
       |es AS (
       |  SELECT st.cmp, st.p, sz.na, sz.nb,
       |         (2000 * st.sab) // nullif(sz.na * sz.nb, 0) -
       |         (2000 * st.saa) // nullif(sz.na * (sz.na - 1), 0) -
       |         (2000 * st.sbb) // nullif(sz.nb * (sz.nb - 1), 0) AS e_milli
       |  FROM stats st JOIN sizes sz ON st.cmp = sz.cmp),
       |obs AS (
       |  SELECT cmp, na, nb, e_milli AS e_obs_milli FROM es WHERE p = 0)
       |SELECT e.cmp, o.na AS n_a, o.nb AS n_b, o.e_obs_milli,
       |       CAST(sum(CASE WHEN e.e_milli >= o.e_obs_milli
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
       |       (1000 * (1 + CAST(sum(CASE WHEN e.e_milli >= o.e_obs_milli
       |                                  THEN 1 ELSE 0 END) AS BIGINT))) //
       |         ${1 + EdPerms} AS p_permille,
       |       (1000 * (1 + CAST(sum(CASE WHEN e.e_milli >= o.e_obs_milli
       |                                  THEN 1 ELSE 0 END) AS BIGINT))) //
       |         ${1 + EdPerms} <= $EdAlphaPermille AS significant
       |FROM es e JOIN obs o ON e.cmp = o.cmp
       |WHERE e.p > 0
       |GROUP BY e.cmp, o.na, o.nb, o.e_obs_milli
       |ORDER BY e.cmp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q259_energy_permtest" -> (q259 _))

  val oracles: Map[String, String] = Map(
    "q259_energy_permtest" -> q259Oracle)
}
