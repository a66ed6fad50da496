package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_benford_digits" -> (q202 _),
    "q203_cusum_changepoint" -> (q203 _),
    "q205_mutual_information" -> (q205 _))

  val oracles: Map[String, String] = Map(
    "q202_benford_digits" -> q202Oracle,
    "q203_cusum_changepoint" -> q203Oracle,
    "q205_mutual_information" -> q205Oracle)
}
