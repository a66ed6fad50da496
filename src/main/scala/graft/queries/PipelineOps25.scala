package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-10 pack #13: source triage — the tie-corrected Mann-Whitney
  * significance test of each source's quality against the rest (q256)
  * and the total-variation effect size of the same comparison (q257).
  * The two are deliberately a pair: q257 says how DIFFERENT a source's
  * quality distribution is, q256 says whether the difference is more
  * than sampling noise — triage needs both numbers.
  */
object PipelineOps25 {

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q256_ranksum_test" -> (q256 _),
    "q257_source_quality_tvd" -> (q257 _))

  val oracles: Map[String, String] = Map(
    "q256_ranksum_test" -> q256Oracle,
    "q257_source_quality_tvd" -> q257Oracle)
}
