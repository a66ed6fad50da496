package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q135-q137: round-7 widening — recency-decayed scoring in pure
  * integer arithmetic, the ordered multi-step conversion funnel, and
  * robust (median/MAD) outlier detection computed entirely on a
  * compressed frequency domain. Round-6 discipline throughout:
  * integer-only keys and ratios (floor quantize, truncating `div`),
  * 1-row scalar frames broadcast (the declared BNLJ pattern), every
  * query ends in a total ORDER BY.
  */
object PipelineOps10 {

  // ---------------------------------------------------------------- q135

  /** Half-life for the q135 decay, in days. The events corpus spans ~30
    * days, so a weekly half-life exercises shifts 0..4 at every SF.
    */
  val DecayHalfLifeDays = 7

  /** Recency-decayed engagement score per event type. The classic
    * formulation `value · exp(−λ·age)` is float and engine-divergent;
    * the integer form used here is `score >> (age_days div halfLife)`
    * — exact halving per elapsed half-life, deterministic on every
    * engine and JVM. Scores are exact 2-decimal unscaled integers
    * ([[Exact]]'s quantization; values are non-negative by corpus
    * contract, and the arithmetic shift keeps non-negatives
    * non-negative so no sign pin is needed).
    *
    * TRAP pinned here: Java's `>>` (and thus Spark's `shiftright`)
    * masks the shift count to its low 6 bits, so `x >> 64 == x`, NOT
    * 0 — an unbounded age would silently UNDO the decay on ancient
    * rows. The shift is clamped to 62 on both engines (past 62 every
    * positive BIGINT score is already 0).
    *
    * Scale shape: the reference date is a 1-row aggregate broadcast
    * back (no window over the corpus); the decay itself is a narrow
    * codegen'd projection; one map-side-partial aggregate on the tiny
    * event_type domain.
    */
  def q135(spark: SparkSession, dir: String): DataFrame = {
    val scored = table(spark, dir, "events")
      .select(col("event_type"), col("ts").cast("date").as("d"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long")
          .as("score_u2"))
    val ref = scored.agg(max(col("d")).as("ref_d"))
    scored.crossJoin(broadcast(ref))
      .withColumn("decayed", expr(
        s"shiftright(score_u2, CAST(least(datediff(ref_d, d) div " +
          s"$DecayHalfLifeDays, 62) AS INT))"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("score_u2")).as("raw_sum"),
        sum(col("decayed")).as("decayed_sum"),
        max(col("decayed")).as("decayed_max"))
      .orderBy(col("event_type"))
  }

  val q135Oracle: String =
    s"""WITH scored AS (
       |  SELECT event_type, CAST(ts AS DATE) AS d,
       |         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS score_u2
       |  FROM events),
       |ref AS (SELECT max(d) AS ref_d FROM scored)
       |SELECT event_type,
       |       count(*) AS n_events,
       |       CAST(sum(score_u2) AS BIGINT) AS raw_sum,
       |       CAST(sum(score_u2 >> CAST(least(
       |              date_diff('day', d, r.ref_d) // $DecayHalfLifeDays,
       |              62) AS BIGINT)) AS BIGINT) AS decayed_sum,
       |       CAST(max(score_u2 >> CAST(least(
       |              date_diff('day', d, r.ref_d) // $DecayHalfLifeDays,
       |              62) AS BIGINT)) AS BIGINT) AS decayed_max
       |FROM scored CROSS JOIN ref r
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q136

  /** Attribution window for each funnel step, in epoch-microseconds:
    * the next stage must land within 48 hours of the previous stage's
    * anchor (every user in this always-on corpus eventually emits every
    * event type, so an unbounded funnel converts everyone — the
    * deadline is what makes conversion a measurement).
    */
  val AttributionWindowUs: Long = 48L * 3600 * 1000000

  /** Ordered conversion funnel: users who viewed, then clicked strictly
    * AFTER their first view but within [[AttributionWindowUs]], then
    * purchased strictly after that click within the same window — the
    * sequential-temporal-dependency archetype (distinct from q100's
    * per-doc stage funnel, which has no ordering constraint between
    * stages). Stage k's anchor is the EARLIEST qualifying event, so the
    * funnel is greedy-minimal and uniquely determined; all comparisons
    * happen in BIGINT epoch-microseconds, the precision both engines
    * share for this corpus (the Spark loader floor-divides the parquet
    * nanos to micros, and DuckDB truncates the same way — pinned by the
    * q20/q31 precedent).
    *
    * Scale shape: each stage filters its event type BEFORE the
    * per-user aggregate (pushed predicate), and each join keys on
    * user_id — co-partitioned shuffles whose right side shrinks
    * monotonically stage over stage. The final three counts are 1-row
    * frames; conversion ratios are integer per-mille off the stage-1
    * count (broadcast).
    */
  def q136(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("us") > col("t1") &&
        col("us") <= col("t1") + lit(AttributionWindowUs))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("us") > col("t2") &&
        col("us") <= col("t2") + lit(AttributionWindowUs))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
    def cnt(df: DataFrame, ord: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(ord).cast("long").as("stage_ord"),
          lit(name).as("stage"), col("n_users"))
    val base = s1.agg(count(lit(1)).as("n1"))
    cnt(s1, 1, "view").unionAll(cnt(s2, 2, "click_after_view"))
      .unionAll(cnt(s3, 3, "purchase_after_click"))
      .crossJoin(broadcast(base))
      .select(col("stage_ord"), col("stage"), col("n_users"),
        expr("(1000 * n_users) div n1").as("conv_permille"))
      .orderBy(col("stage_ord"))
  }

  val q136Oracle: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |s1 AS (
      |  SELECT user_id, min(us) AS t1 FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.us) AS t2 FROM ev e
      |  JOIN s1 ON s1.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.us > s1.t1
      |    AND e.us <= s1.t1 + $AttributionWindowUs
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.us) AS t3 FROM ev e
      |  JOIN s2 ON s2.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.us > s2.t2
      |    AND e.us <= s2.t2 + $AttributionWindowUs
      |  GROUP BY e.user_id),
      |counts AS (
      |  SELECT CAST(1 AS BIGINT) AS stage_ord, 'view' AS stage,
      |         count(*) AS n_users FROM s1
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'click_after_view', count(*) FROM s2
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT), 'purchase_after_click', count(*)
      |  FROM s3)
      |SELECT c.stage_ord, c.stage, c.n_users,
      |       CAST((1000 * c.n_users) // b.n1 AS BIGINT) AS conv_permille
      |FROM counts c CROSS JOIN (SELECT count(*) AS n1 FROM s1) b
      |ORDER BY c.stage_ord""".stripMargin

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
    // below corpus scale; checkpointed because FOUR consumers (median
    // windows, deviation table, outlier count, final join) would
    // otherwise each replay the events scan + aggregate
    val freq = table(spark, dir, "events")
      .select(col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("x"))
      .groupBy(col("event_type"), col("x")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val wn = Window.partitionBy(col("event_type"))
    val wcum = wn.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = freq
      .withColumn("n", sum(col("cnt")).over(wn))
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy(col("event_type"))
      .agg(min(col("x")).as("med_x"), max(col("n")).as("n_events"))
    val dev = freq.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("x") - col("med_x")).as("d"),
        col("cnt"), col("n_events"))
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("cnt")).as("dcnt"), max(col("n_events")).as("n_events"))
    val wdcum = wn.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dev
      .withColumn("cum", sum(col("dcnt")).over(wdcum))
      .filter(col("cum") >= expr("(n_events + 1) div 2"))
      .groupBy(col("event_type")).agg(min(col("d")).as("mad"))
    val out = freq.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .filter(abs(col("x") - col("med_x")) > lit(MadK) * col("mad"))
      .groupBy(col("event_type")).agg(sum(col("cnt")).as("n_outliers"))
    med.join(broadcast(mad), "event_type")
      .join(out, Seq("event_type"), "left")
      .select(col("event_type"), col("n_events"), col("med_x"), col("mad"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"),
        expr("(1000 * coalesce(n_outliers, 0)) div n_events")
          .as("outlier_permille"))
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
    "q135_decay_score" -> (q135 _),
    "q136_funnel_ordered" -> (q136 _),
    "q137_robust_outliers" -> (q137 _))

  val oracles: Map[String, String] = Map(
    "q135_decay_score" -> q135Oracle,
    "q136_funnel_ordered" -> q136Oracle,
    "q137_robust_outliers" -> q137Oracle)
}
