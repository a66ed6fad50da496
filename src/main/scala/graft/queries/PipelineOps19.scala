package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-10 pack #7: calibration and temporal-structure readouts —
  * the langid reliability curve (q240), per-language quantile
  * normalization of the quality score (q241), and seasonality
  * detection by exact autocorrelation of the hourly event series
  * (q242).
  */
object PipelineOps19 {

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q240_langid_reliability" -> (q240 _),
    "q241_quantile_norm" -> (q241 _),
    "q242_hourly_acf" -> (q242 _))

  val oracles: Map[String, String] = Map(
    "q240_langid_reliability" -> q240Oracle,
    "q241_quantile_norm" -> q241Oracle,
    "q242_hourly_acf" -> q242Oracle)
}
