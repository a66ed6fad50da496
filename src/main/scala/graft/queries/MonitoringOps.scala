package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.{CrossHash, VectorOps}

/** q202/q203/q205: data-quality monitoring probes — the checks an
  * ingest pipeline runs BEFORE trusting a new batch, complementing
  * q199's column profile and q200's skew report.
  *
  *  - q202 Benford first-digit profile of order values (Benford 1938;
  *    Nigrini's fraud-audit use): natural multi-scale amounts follow
  *    P(d) = log10(1+1/d); a flat or spiked digit histogram flags
  *    synthetic or truncated data. Expected permilles are LITERAL
  *    integers (floor of the closed form, precomputed below) — no libm
  *    log10 at query time, so both engines agree bit-for-bit.
  *  - q203 CUSUM change-point scan over daily event volume (Page 1954):
  *    S_t = Σ_{i≤t} (c_i·D − T) — the cumulative deviation from the
  *    global daily mean kept EXACT by scaling through the day count D
  *    instead of dividing (S_D telescopes to 0 by construction, which
  *    the oracle pins). The top-|S_t| days are where the level shifted.
  *
  * Scale shape: q202 is one groupBy on a 9-value key (digit) after a
  * narrow per-row projection — map-side partials collapse the corpus
  * before the exchange. q203 aggregates the corpus to a per-day frame
  * first (time-domain-sized, the q180/q182 argument); the cumulative
  * window then runs un-partitioned over that BOUNDED frame only — the
  * single-partition WindowExec never sees corpus-sized input. Overflow:
  * q203's c·D ≤ total events × day count < 2⁶³ up to ~10¹⁴ events over
  * 10⁴ days; q202's 1000·n is trivially safe.
  */
object MonitoringOps {

  /** floor(1000·log10(1+1/d)) for d = 1..9, precomputed so the query
    * never calls a transcendental. */
  private val BenfordPermille =
    Seq(1 -> 301L, 2 -> 176L, 3 -> 124L, 4 -> 96L, 5 -> 79L,
      6 -> 66L, 7 -> 57L, 8 -> 51L, 9 -> 45L)

  // ---------------------------------------------------------------- q202

  /** q202: observed vs Benford-expected first-digit distribution of
    * o_totalprice (in integer cents), with the permille deviation.
    * Cents quantize as floor(x·100 + 0.5) — the repo's standing cents
    * discipline (Relational14/SourceSink): Spark's Round on DOUBLE
    * re-reads the shortest-decimal repr before HALF_UP while DuckDB
    * rounds the exact binary, so round() can fork on either side of a
    * representation boundary where the floor of the identical product
    * cannot. */
  def q202(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expected = BenfordPermille.toDF("digit", "exp_permille")
    val digits = table(spark, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("long").as("digit"))
    val total = digits.agg(count(lit(1)).as("n_total"))
    // expected (9 local rows) preserved on the LEFT, the aggregated
    // observed counts (≤9 rows post-agg) broadcast as the build side —
    // a broadcast hint on the PRESERVED side of an outer join would be
    // silently ignored (only the non-preserved side can be built)
    expected.withColumn("digit", col("digit").cast("long"))
      .join(broadcast(digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))),
        Seq("digit"), "left") // every digit row even if absent
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        expr("1000 * n DIV n_total").as("obs_permille"),
        col("exp_permille"),
        expr("1000 * n DIV n_total - exp_permille").as("dev_permille"))
      .orderBy(col("digit"))
  }

  val q202Oracle: String = {
    val vals = BenfordPermille.map { case (d, p) => s"($d, $p)" }.mkString(", ")
    s"""WITH expected(digit, exp_permille) AS (VALUES $vals),
       |digits AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
       |           AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders),
       |tot AS (SELECT count(*) AS n_total FROM digits),
       |obs AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit)
       |SELECT CAST(e.digit AS BIGINT) AS digit,
       |       CAST(coalesce(o.n, 0) AS BIGINT) AS n,
       |       CAST(1000 * coalesce(o.n, 0) // n_total AS BIGINT)
       |         AS obs_permille,
       |       CAST(e.exp_permille AS BIGINT) AS exp_permille,
       |       CAST(1000 * coalesce(o.n, 0) // n_total - e.exp_permille
       |         AS BIGINT) AS dev_permille
       |FROM expected e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN tot
       |ORDER BY digit""".stripMargin
  }

  // ---------------------------------------------------------------- q203

  /** q203: top-5 CUSUM change-point candidates over daily event
    * volume — the days with the largest |cumulative deviation from the
    * global daily mean|, deviation kept exact by D-scaling. */
  def q203(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val totals = daily.agg(count(lit(1)).as("d_days"), sum(col("c")).as("t_total"))
    // the cumulative window runs over the BOUNDED per-day frame — the
    // un-partitioned WindowExec is safe here and only here
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(totals))
      .withColumn("cusum_scaled",
        sum(col("c") * col("d_days") - col("t_total")).over(w))
      .select(col("day"), col("c"), col("cusum_scaled"))
      .orderBy(abs(col("cusum_scaled")).desc, col("day"))
      .limit(5)
  }

  val q203Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS c
      |  FROM events GROUP BY day),
      |tot AS (SELECT count(*) AS d_days, sum(c) AS t_total FROM daily),
      |cu AS (
      |  SELECT day, c,
      |         sum(c * d_days - t_total) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS cusum_scaled
      |  FROM daily CROSS JOIN tot)
      |SELECT day, CAST(c AS BIGINT) AS c,
      |       CAST(cusum_scaled AS BIGINT) AS cusum_scaled
      |FROM cu ORDER BY abs(cusum_scaled) DESC, day LIMIT 5""".stripMargin

  // ---------------------------------------------------------------- q205

  /** q205: mutual information between event type and day-of-week — the
    * column-dependence probe (does traffic mix shift by weekday?) that
    * complements q196's per-user entropy and q179's cross-corpus KL.
    * MI·N in micronats: S = Σ_xy c_xy·(L(c_xy) + L(N) − L(c_x) − L(c_y))
    * with L = round(ln·10⁶) under the q190 micronat discipline (one ln
    * per DISTINCT count, quantized identically on both engines). S is
    * reported UNDIVIDED (scaled by N): true MI ≥ 0, but micronat
    * rounding can push a near-independent S a few micro below zero, and
    * Spark DIV truncates where DuckDB // floors — division by N is the
    * reader's step, not the query's (the q198 negative-operand rule).
    *
    * Scale shape: ONE corpus groupBy to the (type × dow) cell frame
    * (≤ |types|·7 rows); marginals, N and the MI fold all run on that
    * bounded frame. Day-of-week is epoch-day mod 7 — engine-neutral
    * where dayofweek() origins differ (Spark 1=Sun, DuckDB 0=Sun).
    * Overflow: |each term| ≤ c·4·L(N) — int64-safe below ~10¹¹ events.
    */
  def q205(spark: SparkSession, dir: String): DataFrame = {
    val lnMicro = (c: org.apache.spark.sql.Column) =>
      round(log(c.cast("double")) * 1000000d, 0).cast("long")
    val cells = table(spark, dir, "events")
      .select(col("event_type").as("x"),
        expr("unix_micros(ts) DIV 86400000000 % 7").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // 3 marginal consumers + the fold
    val mx = cells.groupBy(col("x")).agg(sum(col("c")).as("cx"))
    val my = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val n = cells.agg(sum(col("c")).as("n_events"))
    cells
      .join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(n))
      .select(col("n_events"),
        (col("c") * (lnMicro(col("c")) + lnMicro(col("n_events"))
          - lnMicro(col("cx")) - lnMicro(col("cy")))).as("term"))
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_cells"), sum(col("term")).as("mi_sum_micro"))
      .select(col("n_events"), col("n_cells"), col("mi_sum_micro"))
  }

  val q205Oracle: String =
    """WITH cells AS MATERIALIZED (
      |  SELECT event_type AS x, epoch_us(ts) // 86400000000 % 7 AS y,
      |         count(*) AS c
      |  FROM events GROUP BY x, y),
      |mx AS (SELECT x, sum(c) AS cx FROM cells GROUP BY x),
      |my AS (SELECT y, sum(c) AS cy FROM cells GROUP BY y),
      |tot AS (SELECT sum(c) AS n_events FROM cells)
      |SELECT CAST(n_events AS BIGINT) AS n_events,
      |       CAST(count(*) AS BIGINT) AS n_cells,
      |       CAST(sum(c * (CAST(round(ln(c) * 1000000, 0) AS BIGINT)
      |                   + CAST(round(ln(n_events) * 1000000, 0) AS BIGINT)
      |                   - CAST(round(ln(cx) * 1000000, 0) AS BIGINT)
      |                   - CAST(round(ln(cy) * 1000000, 0) AS BIGINT)))
      |         AS BIGINT) AS mi_sum_micro
      |FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
      |GROUP BY n_events""".stripMargin


  // ---------------------------------------------------------------- q256

  /** Two-sided normal-approximation critical value at α = 0.05. */
  val RankZCrit = 1.96d

  /** q256: per-source MANN-WHITNEY rank-sum TEST — q243 uses the U
    * statistic as a ranking summary (AUC); this uses it as the TEST it
    * was built for: for each source, is its quality distribution
    * significantly different from the rest of the corpus? The doubled
    * U (integer, tie-exact) comes from the bounded (source, q_u3)
    * histogram against the corpus histogram — cumother(<v) =
    * cumGlobal(<v) − cumSource(<v), never a pairwise pass — and the
    * normal approximation uses the TIE-CORRECTED variance
    * σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1))) (with a 31-value score
    * domain the ties ARE the distribution; the uncorrected σ would
    * overstate significance everywhere). Σ(t³−t) is exact in
    * DECIMAL(38,0)/HUGEINT over the global histogram (g³ would wrap
    * int64 at tie groups of ~2.1·10⁶); z is ONE fixed double
    * expression over integer moments (the q189 single-combination
    * discipline), rounded to 6; the significance call compares the
    * bit-identical pre-round double, so no boundary can fork
    * cross-engine.
    *
    * Scale shape: one corpus scan → the (source, q_u3) histogram;
    * every cumsum, moment, and the verdict run on that ≤ sources×1001
    * frame. u2 exact while n₁·n₂ < 2⁶²; beyond 2⁵³ total docs the z
    * moments are IEEE-rounded identically on both engines.
    */
  def q256(spark: SparkSession, dir: String): DataFrame = {
    val hist = Dedup.withQualU3(
        table(spark, dir, "documents")
          .withColumn("n_chars", length(col("text")).cast("long")))
      .groupBy(col("source"), col("q_u3"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // bounded; global hist + per-source walk read it
    val glob = hist.groupBy(col("q_u3")).agg(sum(col("cnt")).as("g"))
    val wg = Window.orderBy(col("q_u3"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globCum = glob
      .withColumn("cumg", sum(col("g")).over(wg) - col("g"))
    // Σ(t³−t) in DECIMAL(38,0): g³ wraps int64 once any tie group
    // passes ~2.1·10⁶ docs — certain on a 31-value score domain well
    // before the doc-count bounds elsewhere; 38 digits hold the cube
    // exactly to g ~ 2·10¹². t3 only ever feeds the double z.
    val ties = glob.agg(
      sum(col("g")).as("n"),
      sum(col("g").cast("decimal(38,0)") * col("g") * col("g") - col("g"))
        .as("t3"))
    val ws = Window.partitionBy(col("source")).orderBy(col("q_u3"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cums", sum(col("cnt")).over(ws) - col("cnt"))
      .join(globCum, Seq("q_u3"))
      .select(col("source"), col("cnt"),
        (col("cumg") - col("cums")).as("cumo"),
        (col("g") - col("cnt")).as("o"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_src"),
        sum(col("cnt") * (lit(2L) * col("cumo") + col("o"))).as("u2"))
      .crossJoin(broadcast(ties))
      .withColumn("n_rest", col("n") - col("n_src"))
      .withColumn("z", expr(
        """round((CAST(u2 AS DOUBLE) - CAST(n_src AS DOUBLE) * n_rest) /
          | (2 * sqrt((CAST(n_src AS DOUBLE) * n_rest / 12) *
          |   ((CAST(n AS DOUBLE) + 1) -
          |    CAST(t3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))), 6)"""
          .stripMargin))
      .withColumn("significant", expr(
        s"""abs((CAST(u2 AS DOUBLE) - CAST(n_src AS DOUBLE) * n_rest) /
           | (2 * sqrt((CAST(n_src AS DOUBLE) * n_rest / 12) *
           |   ((CAST(n AS DOUBLE) + 1) -
           |    CAST(t3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))))
           | > $RankZCrit""".stripMargin))
      .select(col("source"), col("n_src"), col("n_rest"), col("u2"),
        col("z"), col("significant"))
      .orderBy(col("source"))
  }

  val q256Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH docsq AS (
       |  SELECT source, $qualSql AS q_u3
       |  FROM (
       |    SELECT source, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |hist AS (
       |  SELECT source, q_u3, count(*) AS cnt
       |  FROM docsq GROUP BY 1, 2),
       |gh AS (
       |  SELECT q_u3, CAST(sum(cnt) AS BIGINT) AS g
       |  FROM hist GROUP BY q_u3),
       |gc AS (
       |  SELECT q_u3, g,
       |         CAST(sum(g) OVER (ORDER BY q_u3
       |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) - g AS cumg
       |  FROM gh),
       |ties AS (
       |  SELECT CAST(sum(g) AS BIGINT) AS n,
       |         sum(CAST(g AS HUGEINT) * g * g - g) AS t3
       |  FROM gh),
       |sc AS (
       |  SELECT source, q_u3, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY source ORDER BY q_u3
       |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) - cnt AS cums
       |  FROM hist),
       |uu AS (
       |  SELECT s.source, CAST(sum(s.cnt) AS BIGINT) AS n_src,
       |         CAST(sum(s.cnt * (2 * (c.cumg - s.cums) + (c.g - s.cnt)))
       |              AS BIGINT) AS u2
       |  FROM sc s JOIN gc c ON s.q_u3 = c.q_u3
       |  GROUP BY s.source)
       |SELECT source, n_src, n - n_src AS n_rest, u2,
       |       round((CAST(u2 AS DOUBLE) - CAST(n_src AS DOUBLE) *
       |              (n - n_src)) /
       |         (2 * sqrt((CAST(n_src AS DOUBLE) * (n - n_src) / 12) *
       |           ((CAST(n AS DOUBLE) + 1) -
       |            CAST(t3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))), 6)
       |         AS z,
       |       abs((CAST(u2 AS DOUBLE) - CAST(n_src AS DOUBLE) *
       |            (n - n_src)) /
       |         (2 * sqrt((CAST(n_src AS DOUBLE) * (n - n_src) / 12) *
       |           ((CAST(n AS DOUBLE) + 1) -
       |            CAST(t3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))))
       |         > $RankZCrit AS significant
       |FROM uu CROSS JOIN ties ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q257

  /** q257: per-source quality TVD — the EFFECT SIZE for q256's verdict:
    * total variation distance between each source's quality histogram
    * and the corpus's, ½·Σ|p_s − p| in exact integer permille over the
    * common denominator N_s·N (never a float probability). A source can
    * be significantly different (q256, huge n) yet negligibly far
    * (tiny TVD) — triage ranks by THIS number and gates by that one.
    *
    * Scale shape: the same bounded (source, q_u3) histogram as q256;
    * the distance is one join + one aggregate on it. Int64 budget: the
    * summed numerator is bounded by 2·N_s·N and the permille step
    * multiplies it by 1000, so exactness holds while N_s·N < ~4.6·10¹⁵
    * — worst case ~7·10⁷ docs for a source that is half the corpus,
    * ~10⁹ docs at a realistic ≤2% source share. Beyond that,
    * permille-quantize the histograms first (documented, not silently
    * wrong — the q189 bound discipline).
    */
  def q257(spark: SparkSession, dir: String): DataFrame = {
    val hist = Dedup.withQualU3(
        table(spark, dir, "documents")
          .withColumn("n_chars", length(col("text")).cast("long")))
      .groupBy(col("source"), col("q_u3"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val glob = hist.groupBy(col("q_u3")).agg(sum(col("cnt")).as("g"))
    val tot = glob.agg(sum(col("g")).as("n"))
    val perSrc = hist.groupBy(col("source")).agg(sum(col("cnt")).as("ns"))
    // full sources × values grid (bounded): a score value the source
    // never produced still contributes |0 − g·ns| mass
    perSrc.crossJoin(glob)
      .join(hist, Seq("source", "q_u3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("ns"), col("n"),
        coalesce(col("cnt"), lit(0L)).as("cnt"), col("g"))
      .groupBy(col("source"), col("ns"), col("n"))
      .agg(sum(abs(col("cnt") * col("n") - col("g") * col("ns")))
        .as("num"))
      .select(col("source"), col("ns").as("n_docs"),
        expr("(1000 * num) div (2 * ns * n)").as("tvd_permille"))
      .orderBy(col("source"))
  }

  val q257Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH docsq AS (
       |  SELECT source, $qualSql AS q_u3
       |  FROM (
       |    SELECT source, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |hist AS (
       |  SELECT source, q_u3, count(*) AS cnt
       |  FROM docsq GROUP BY 1, 2),
       |gh AS (
       |  SELECT q_u3, CAST(sum(cnt) AS BIGINT) AS g
       |  FROM hist GROUP BY q_u3),
       |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n FROM gh),
       |src AS (
       |  SELECT source, CAST(sum(cnt) AS BIGINT) AS ns
       |  FROM hist GROUP BY source),
       |grid AS (
       |  SELECT s.source, s.ns, g.q_u3, g.g,
       |         COALESCE(h.cnt, 0) AS cnt
       |  FROM src s CROSS JOIN gh g
       |  LEFT JOIN hist h ON h.source = s.source AND h.q_u3 = g.q_u3)
       |SELECT gr.source, any_value(gr.ns) AS n_docs,
       |       (1000 * CAST(sum(abs(gr.cnt * t.n - gr.g * gr.ns))
       |                    AS BIGINT)) //
       |         (2 * any_value(gr.ns) * any_value(t.n)) AS tvd_permille
       |FROM grid gr CROSS JOIN tot t
       |GROUP BY gr.source ORDER BY gr.source""".stripMargin
  }


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
        VectorOps.quantize(col("embedding"), ReleaseOps.EmbQScale)
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
      // OPTIMIZATION r17 (guide §2.6 idle capacity / §2.5): spread the
      // pair frame across the cluster before checkpointing. Every
      // downstream byte-cost is tiny but the PER-ROW work is not: each
      // pair row expands (1+perms)× through the two broadcast endpoint
      // joins into the (cmp, p) aggregate — ~4M probe+agg rows from
      // ~40k pairs. The pair frame inherits its partitioning from the
      // 2-partition members checkpoint, so that whole expansion ran in
      // 2 tasks (QProfile r17: 1.24 s wall / 1.70 s CPU on a 32-core
      // session, the query's dominant stage). Repartitioning ~40k rows
      // costs microseconds and lets the expansion use every core; at
      // cluster scale defaultParallelism is the executor-core count —
      // the same knob, not a local[32] constant.
      .repartition(spark.sparkContext.defaultParallelism)
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
      // (1+perms)×members ≤ 40k rows; consumed TWICE (the va and vb
      // endpoint joins) — checkpointing stops the h60-rank window and
      // its shuffle from evaluating once per endpoint
      .localCheckpoint()
    // OPTIMIZATION r16 (guide §3.1): both endpoint joins carry the
    // (1+perms)×members assignment frame (≤ ~40k rows at ANY corpus
    // size — panel-bounded) against the ≤ 2·C(200,2) pair frame; the
    // static planner picked SortMergeJoin (3 exchanges + 2 sorts of the
    // 4M-row intermediate). Broadcasting both assignment sides makes
    // the whole pair×perm expansion one pipelined map stage into the
    // final (cmp, p) aggregate — 1 exchange instead of 4.
    val stats = pairs
      .join(broadcast(assign.select(col("cmp"), col("p"),
        col("vec_id").as("va"), col("pg").as("ga"))), Seq("cmp", "va"))
      .join(broadcast(assign.select(col("cmp"), col("p"),
        col("vec_id").as("vb"), col("pg").as("gb"))), Seq("cmp", "p", "vb"))
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
       |           CAST(floor(CAST(e AS DOUBLE) * ${ReleaseOps.EmbQScale})
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


  // ---------------------------------------------------------------- q240

  /** Margin cap: margins at or above this land in the top bin. */
  val ReliabilityBinMax = 10L

  /** q240: langid RELIABILITY curve — is the classifier's confidence
    * (top-score minus runner-up margin) actually predictive of
    * correctness? The standard calibration readout (reliability
    * diagram) for any scorer that gates downstream routing: per margin
    * bin, document mass and exact accuracy permille. A filter that
    * trusts high-margin predictions is only defensible if this curve
    * rises — the q147/q232 calibration-audit pattern applied to the
    * classifier family (q25 confusion, q231 kappa, q240 calibration).
    * Shares the scored frame via [[TextAnalysis.langidPredicted]]
    * (single-copy rule); margins are exact integers, so bins and
    * accuracies hash cross-engine.
    *
    * Scale shape: one corpus scan into the ≤ [[ReliabilityBinMax]]+1
    * bin frame; constant post-scan cost at any corpus size.
    */
  def q240(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langidPredicted(spark, dir)
      .select(col("lang"), col("predicted"),
        least(col("margin"), lit(ReliabilityBinMax)).as("bin"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("lang") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_permille", expr("(1000 * n_correct) div n_docs"))
      .orderBy(col("bin"))

  val q240Oracle: String =
    s"""WITH ${TextAnalysis.langidPredCtes},
       |b AS (
       |  SELECT least(margin, $ReliabilityBinMax) AS bin,
       |         CASE WHEN lang = predicted THEN 1 ELSE 0 END AS ok
       |  FROM pred)
       |SELECT bin, count(*) AS n_docs,
       |       CAST(sum(ok) AS BIGINT) AS n_correct,
       |       (1000 * CAST(sum(ok) AS BIGINT)) // count(*) AS acc_permille
       |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q241

  /** Global raw-score selection threshold (q_u3 scale, 0..1000). */
  val RawSelThresh = 700L

  /** Per-lang percentile selection threshold (permille rank). */
  val NormSelPct = 700L

  /** q241: per-language QUANTILE NORMALIZATION of the quality score —
    * the stratified-selection fix for score-scale drift across
    * languages: a fixed raw threshold (keep q_u3 ≥ 700) selects wildly
    * different fractions per language when score distributions differ,
    * while a percentile rule (keep each language's top 30%) selects
    * comparably everywhere. Reports, per language: corpus mass, the
    * raw-threshold selection, the percentile selection, their overlap,
    * and the percentile rule's effective raw cut — the evidence for
    * choosing one policy over the other.
    *
    * Percentiles are Hazen-style doubled-midrank permilles
    * (500·m₂ div n over the bounded (lang, q_u3) histogram — the
    * q230/q168 walk; NO corpus sort), and since both selection flags
    * are functions of (lang, q_u3) alone, the ENTIRE query after the
    * one corpus scan runs on the ≤ langs×1001-row histogram.
    */
  def q241(spark: SparkSession, dir: String): DataFrame = {
    val hist = Dedup.withQualU3(
        table(spark, dir, "documents")
          .withColumn("n_chars", length(col("text")).cast("long")))
      .groupBy(col("lang"), col("q_u3"))
      .agg(count(lit(1)).as("cnt"))
      // bounded (langs × score domain ≤ 1001); materialized so the
      // midrank window and the final rollup read one frame (q230 rule)
      .localCheckpoint()
    val w = Window.partitionBy(col("lang")).orderBy(col("q_u3"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
      .withColumn("pct",
        expr("(500 * (2 * (cum - cnt) + cnt + 1)) div n"))
      .groupBy(col("lang"))
      .agg(
        sum(col("cnt")).as("n_docs"),
        sum(when(col("q_u3") >= RawSelThresh, col("cnt")).otherwise(0L))
          .as("n_raw_sel"),
        sum(when(col("pct") >= NormSelPct, col("cnt")).otherwise(0L))
          .as("n_norm_sel"),
        sum(when(col("q_u3") >= RawSelThresh && col("pct") >= NormSelPct,
          col("cnt")).otherwise(0L)).as("n_both"),
        min(when(col("pct") >= NormSelPct, col("q_u3"))).as("norm_cut_q"))
      .orderBy(col("lang"))
  }

  val q241Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH docsq AS (
       |  SELECT lang, $qualSql AS q_u3
       |  FROM (
       |    SELECT lang, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |hist AS (
       |  SELECT lang, q_u3, count(*) AS cnt FROM docsq GROUP BY 1, 2),
       |m AS (
       |  SELECT lang, q_u3, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY q_u3
       |                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |         CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
       |  FROM hist),
       |p AS (
       |  SELECT lang, q_u3, cnt,
       |         (500 * (2 * (cum - cnt) + cnt + 1)) // n AS pct
       |  FROM m)
       |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN q_u3 >= $RawSelThresh THEN cnt ELSE 0 END)
       |            AS BIGINT) AS n_raw_sel,
       |       CAST(sum(CASE WHEN pct >= $NormSelPct THEN cnt ELSE 0 END)
       |            AS BIGINT) AS n_norm_sel,
       |       CAST(sum(CASE WHEN q_u3 >= $RawSelThresh AND pct >= $NormSelPct
       |                     THEN cnt ELSE 0 END) AS BIGINT) AS n_both,
       |       min(CASE WHEN pct >= $NormSelPct THEN q_u3 END) AS norm_cut_q
       |FROM p GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q242

  /** Autocorrelation lags, in hours: daily and weekly seasonality. */
  val AcfLags: Seq[Long] = Seq(24L, 168L)

  /** q242: SEASONALITY detection by exact autocorrelation of the
    * hourly event-count series at the daily and weekly lags — the
    * periodic-structure readout the drift family (q117 TVD, q209 KS,
    * CUSUM change-point) cannot see: those compare distributions,
    * this measures whether the series repeats itself. The series is
    * gap-filled onto the full hour spine (a missing hour is a REAL
    * zero — skipping it would misalign every lag pair), counts come
    * from one corpus scan, and r is Pearson over (c(h), c(h+L)) pairs
    * with int64-exact moments and the single-IEEE-combination q189
    * discipline; exact `sxy` rides along so the gate pins the integer
    * moment.
    *
    * Scale shape: one corpus scan → the bounded (hour, count) spine
    * (years of data ≈ 10⁴–10⁵ rows); both lag joins and all moments
    * run on that frame (localCheckpoint'ed — the q230 rule). At 100 TB
    * the spine is still tiny: its size is set by the time span, not
    * the event volume.
    */
  def q242(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "events")
      .select(expr("unix_micros(ts) div 3600000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("c"))
    val spine = counts.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(expr("sequence(h0, h1)")).as("h"))
      .join(counts, Seq("h"), "left")
      .select(col("h"), coalesce(col("c"), lit(0L)).as("c"))
      .localCheckpoint()
    val perLag = AcfLags.map { lag =>
      spine.as("a")
        .join(spine.as("b"), col("a.h") + lit(lag) === col("b.h"))
        .select(col("a.c").as("x"), col("b.c").as("y"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(lit(lag).as("lag_hours"), col("n_pairs"), col("sxy"),
          expr("round((cast(n_pairs as double) * sxy - cast(sx as double) * sy) /" +
            " nullif(sqrt(greatest(cast(n_pairs as double) * sxx -" +
            " cast(sx as double) * sx, 0)) *" +
            " sqrt(greatest(cast(n_pairs as double) * syy -" +
            " cast(sy as double) * sy, 0)), 0), 6)").as("acf_r"))
    }
    perLag.reduce(_ unionByName _).orderBy(col("lag_hours"))
  }

  val q242Oracle: String = {
    val lagSelects = AcfLags.map { lag =>
      s"""  SELECT $lag AS lag_hours, count(*) AS n_pairs,
         |         CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy,
         |         CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
         |         CAST(sum(b.c * b.c) AS BIGINT) AS syy,
         |         CAST(sum(a.c * b.c) AS BIGINT) AS sxy
         |  FROM spine a JOIN spine b ON a.h + $lag = b.h""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH counts AS (
       |  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS c
       |  FROM events GROUP BY 1),
       |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM counts),
       |spine AS (
       |  SELECT g.h, COALESCE(c.c, 0) AS c
       |  FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) g
       |  LEFT JOIN counts c ON c.h = g.h),
       |mo AS (
       |$lagSelects)
       |SELECT lag_hours, n_pairs, sxy,
       |       round((CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
       |             nullif(sqrt(greatest(CAST(n_pairs AS DOUBLE) * sxx -
       |                         CAST(sx AS DOUBLE) * sx, 0)) *
       |                    sqrt(greatest(CAST(n_pairs AS DOUBLE) * syy -
       |                         CAST(sy AS DOUBLE) * sy, 0)), 0), 6)
       |         AS acf_r
       |FROM mo ORDER BY lag_hours""".stripMargin
  }

  // ---------------------------------------------------------------- q209

  /** The derived release's documents as a DuckDB CTE — the exact
    * spelling q121's oracle uses for [[ReleaseOps.snapshotBDocs]].
    */
  private val BdocsCte: String =
    """bdocs AS (
      |  SELECT doc_id, lang,
      |         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1 AS doc_id, lang, 'new:' || text AS text
      |  FROM documents WHERE doc_id % 17 = 0)""".stripMargin

  /** q209: EXACT two-sample Kolmogorov–Smirnov statistic between the
    * shipped corpus and the derived release over document length — the
    * order-statistic drift test q117's 20-bin histogram TVD
    * approximates: D = sup over ALL thresholds of |F_A(v) − F_B(v)|,
    * so a shift concentrated inside one histogram bin (invisible to
    * TVD-over-bins) still moves D. Reported EXACTLY in integers by
    * cross-multiplying the CDFs (gap = |cumA·n_B − cumB·n_A|, max over
    * the value domain, denominator n_A·n_B) with the argmax threshold
    * (lowest value attaining D) — no division until the final permille
    * readout. Int64-safe while n_A·n_B < 2⁶³ (~3·10⁹ docs per side).
    *
    * Scale shape: both corpus scans collapse to per-length counts
    * (value-domain-sized — thousands of rows at any corpus size)
    * before the single unpartitioned cumulative window runs, the q203
    * bounded-spine argument; the max+argmax fold is one min-struct
    * aggregate over that domain frame.
    */
  def q209(spark: SparkSession, dir: String): DataFrame = {
    val a = table(spark, dir, "documents")
      .select(length(col("text")).cast("long").as("v"),
        lit(1L).as("ia"), lit(0L).as("ib"))
    val b = ReleaseOps.snapshotBDocs(spark, dir)
      .select(length(col("text")).cast("long").as("v"),
        lit(0L).as("ia"), lit(1L).as("ib"))
    val counts = a.unionAll(b).groupBy(col("v"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.crossJoin(broadcast(tot))
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .select(col("n_a"), col("n_b"), col("v"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")).as("gap"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(struct(col("gap").as("g"), (-col("v")).as("nv"))).as("best"))
      .select(col("n_a"), col("n_b"),
        col("best.g").as("ks_scaled"),
        expr("1000 * best.g DIV (n_a * n_b)").as("ks_permille"),
        (-col("best.nv")).as("at_value"))
  }

  val q209Oracle: String =
    s"""WITH $BdocsCte,
       |vals AS (
       |  SELECT length(text) AS v, 1 AS ia, 0 AS ib FROM documents
       |  UNION ALL
       |  SELECT length(text) AS v, 0 AS ia, 1 AS ib FROM bdocs),
       |counts AS (
       |  SELECT v, sum(ia) AS ca, sum(ib) AS cb FROM vals GROUP BY v),
       |tot AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM counts),
       |cum AS (
       |  SELECT v,
       |         sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |                       AND CURRENT ROW) AS cum_a,
       |         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
       |                       AND CURRENT ROW) AS cum_b
       |  FROM counts),
       |gaps AS (
       |  SELECT v, abs(cum_a * n_b - cum_b * n_a) AS gap
       |  FROM cum CROSS JOIN tot),
       |best AS (SELECT max(gap) AS d FROM gaps)
       |SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       |       CAST(b.d AS BIGINT) AS ks_scaled,
       |       CAST(1000 * b.d // (t.n_a * t.n_b) AS BIGINT) AS ks_permille,
       |       CAST((SELECT min(v) FROM gaps WHERE gap = b.d) AS BIGINT)
       |         AS at_value
       |FROM tot t CROSS JOIN best b""".stripMargin

  // ---------------------------------------------------------------- q137

  /** MAD multiplier: a value is an outlier when
    * |x − median| > [[MadK]] · MAD.
    */
  val MadK = 3

  /** Robust per-event-type value-outlier detection: exact median and
    * median-absolute-deviation of the (2-decimal quantized) event
    * value, and the count of events beyond [[MadK]]·MAD — the robust
    * replacement for the mean/stddev screen (which outliers themselves
    * corrupt; this corpus's value column is heavy-tailed, so ~12% of
    * events sit past 3·MAD while a 3σ screen would move with them).
    * "Median" is the LOWER median (the ascending element at rank
    * `(n+1) div 2`), so it is an actual corpus value and needs no
    * cross-engine interpolation contract.
    *
    * Scale shape — the reason this query exists: both medians are
    * computed on the (type, cents) FREQUENCY table, never on the
    * corpus. One narrow scan compresses ~anything to ≤ |types|·|value
    * domain| rows (the 2-decimal domain is closed and bounded); the
    * cumulative-count windows, the deviation re-agg, and the outlier
    * count all run on that compressed frame — the deviation histogram
    * is derived FROM the value histogram, so Spark's exchange-reuse
    * serves all three passes from ONE corpus scan (pinned by
    * ArchetypePackSpec), unlike the q33 two-pass selection which must
    * re-visit candidate bins because doubles don't compress.
    */
  def q137(spark: SparkSession, dir: String): DataFrame = {
    // bounded by distinct (type, cents) — the q33 histogram class, far
    // below corpus scale (the 2-decimal domain is closed)
    val freq = table(spark, dir, "events")
      .select(col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("x"))
      .groupBy(col("event_type"), col("x")).agg(count(lit(1)).as("cnt"))
    // OPTIMIZATION r17 (guide §2.4, §1.2 "the distributed algorithm" —
    // the q250 fold discipline): the r16 shape still ran median, MAD and
    // the outlier count as a 16-exchange window/join cascade over the
    // tiny frequency frame (QProfile r16: 15 stage-jobs, ~2.3 s, all
    // driver gaps between 20-140 ms mini-stages). Each per-type
    // histogram is VALUE-DOMAIN-bounded (~10k cents rows at any corpus
    // size), so the whole cascade fits one row per type: collect the
    // sorted histogram and compute lower-median, MAD and the outlier
    // count in expression folds. Same integer arithmetic, same lower-
    // median rank ((n+1) div 2, first crossing in ascending order —
    // elementwise cum over the d-sorted deviation list crosses the
    // threshold at exactly the grouped histogram's min d, since the
    // grouped cum at d equals the elementwise cum at d's last element.
    // The corpus pays the same single scan + (type, x) partial-agg
    // shuffle; the plan is 2 exchanges instead of 16, no checkpoint
    // (the frequency frame now has ONE consumer).
    def lowerMedian(arr: String, v: String): String =
      s"""aggregate($arr,
         |  named_struct('cum', CAST(0 AS BIGINT), 'm', CAST(NULL AS BIGINT)),
         |  (a, s) -> IF(a.m IS NOT NULL, a,
         |    named_struct('cum', a.cum + s.cnt,
         |      'm', IF(a.cum + s.cnt >= (n_events + 1) div 2, s.$v,
         |              CAST(NULL AS BIGINT)))),
         |  a -> a.m)""".stripMargin
    freq.groupBy(col("event_type"))
      .agg(expr("array_sort(collect_list(struct(x, cnt)))").as("xs"),
        sum(col("cnt")).as("n_events"))
      .withColumn("med_x", expr(lowerMedian("xs", "x")))
      .withColumn("ds", expr(
        "array_sort(transform(xs, s -> struct(abs(s.x - med_x) AS d, s.cnt AS cnt)))"))
      .withColumn("mad", expr(lowerMedian("ds", "d")))
      .withColumn("n_outliers", expr(
        s"aggregate(filter(ds, s -> s.d > $MadK * mad), CAST(0 AS BIGINT), (a, s) -> a + s.cnt)"))
      .select(col("event_type"), col("n_events"), col("med_x"), col("mad"),
        col("n_outliers"),
        expr("(1000 * n_outliers) div n_events").as("outlier_permille"))
      .orderBy(col("event_type"))
  }

  val q137Oracle: String =
    s"""WITH freq AS (
       |  SELECT event_type,
       |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
       |         count(*) AS cnt
       |  FROM events GROUP BY event_type, x),
       |cums AS (
       |  SELECT event_type, x, cnt,
       |         sum(cnt) OVER (PARTITION BY event_type) AS n,
       |         sum(cnt) OVER (PARTITION BY event_type ORDER BY x
       |                        ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM freq),
       |med AS (
       |  SELECT event_type, min(x) AS med_x,
       |         CAST(max(n) AS BIGINT) AS n_events
       |  FROM cums WHERE cum >= (n + 1) // 2 GROUP BY event_type),
       |dev AS (
       |  SELECT f.event_type, abs(f.x - m.med_x) AS d,
       |         sum(f.cnt) AS dcnt, max(m.n_events) AS n_events
       |  FROM freq f JOIN med m ON m.event_type = f.event_type
       |  GROUP BY f.event_type, abs(f.x - m.med_x)),
       |dcums AS (
       |  SELECT event_type, d, dcnt, n_events,
       |         sum(dcnt) OVER (PARTITION BY event_type ORDER BY d
       |                         ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM dev),
       |mad AS (
       |  SELECT event_type, min(d) AS mad FROM dcums
       |  WHERE cum >= (n_events + 1) // 2 GROUP BY event_type),
       |outl AS (
       |  SELECT f.event_type, CAST(sum(f.cnt) AS BIGINT) AS n_outliers
       |  FROM freq f
       |  JOIN med m ON m.event_type = f.event_type
       |  JOIN mad a ON a.event_type = f.event_type
       |  WHERE abs(f.x - m.med_x) > $MadK * a.mad
       |  GROUP BY f.event_type)
       |SELECT m.event_type, m.n_events, m.med_x, a.mad,
       |       CAST(coalesce(o.n_outliers, 0) AS BIGINT) AS n_outliers,
       |       CAST((1000 * coalesce(o.n_outliers, 0)) // m.n_events
       |            AS BIGINT) AS outlier_permille
       |FROM med m
       |JOIN mad a ON a.event_type = m.event_type
       |LEFT JOIN outl o ON o.event_type = m.event_type
       |ORDER BY m.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_benford_digits" -> (q202 _),
    "q203_cusum_changepoint" -> (q203 _),
    "q205_mutual_information" -> (q205 _),
    "q256_ranksum_test" -> (q256 _),
    "q257_source_quality_tvd" -> (q257 _),
    "q259_energy_permtest" -> (q259 _),
    "q240_langid_reliability" -> (q240 _),
    "q241_quantile_norm" -> (q241 _),
    "q242_hourly_acf" -> (q242 _),
    "q209_ks_drift" -> (q209 _),
    "q137_robust_outliers" -> (q137 _))

  val oracles: Map[String, String] = Map(
    "q202_benford_digits" -> q202Oracle,
    "q203_cusum_changepoint" -> q203Oracle,
    "q205_mutual_information" -> q205Oracle,
    "q256_ranksum_test" -> q256Oracle,
    "q257_source_quality_tvd" -> q257Oracle,
    "q259_energy_permtest" -> q259Oracle,
    "q240_langid_reliability" -> q240Oracle,
    "q241_quantile_norm" -> q241Oracle,
    "q242_hourly_acf" -> q242Oracle,
    "q209_ks_drift" -> q209Oracle,
    "q137_robust_outliers" -> q137Oracle)
}
