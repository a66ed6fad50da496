package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q180-q188: event-stream shape diagnostics — burstiness, marketing
  * attribution, cross-type co-movement, temporal-table reconstruction
  * and gaps-and-islands streaks — the monitoring companions to q140
  * (burst hours) and q141 (transition counts).
  *
  *  - q180 Fano factor (variance-to-mean ratio, Fano 1947) of hourly
  *    event counts per type: ≈1 for a Poisson arrival process, >1 for
  *    bursty traffic. Computed over hours WHERE THE TYPE OCCURS (no
  *    zero-filled spine — the truncation is documented, identical on
  *    both engines, and keeps the frame bounded by active hours).
  *    Pure integer rational: F = (n·Σc² − (Σc)²) / (n·Σc), permille.
  *  - q181 last-touch attribution: each purchase is attributed to the
  *    SAME user's most recent strictly-preceding click iff it landed
  *    within 30 minutes — the carry-forward `last(..., ignoreNulls)`
  *    over a rows-preceding frame (the q70 idiom pointed backwards).
  *  - q182 pairwise correlation of hourly volumes between event types
  *    over a zero-filled hour×type spine. Pearson r is computed from
  *    integer-exact moments (n·Σxy − Σx·Σy over √(dx·dy)) rather than
  *    corr(): the integer sums are order-independent, the single final
  *    division is IEEE-rounded identically on both engines, and a
  *    zero-variance series yields NULL (nullif) instead of the ANSI
  *    DIVIDE_BY_ZERO corr() raises.
  *
  * Scale shape: q180/q182 aggregate to an (hour × type) frame first —
  * bounded by the time domain, not the event count — so the corpus-
  * scale work is one groupBy each; q182's self-join and q180's moment
  * math run on that tiny frame (types² pairs). q181 is a single window
  * pass partitioned by user — the state per user is one carried
  * (ts, id) pair, the same bounded-state argument as the streaming
  * sessionizer. Overflow: q180's n·Σc² stays in int64 while
  * hours·(peak rate)² < 9·10¹⁸ — e.g. 10⁵ hours at 10⁶ events/hour;
  * past that, shard the sum by hour ranges (associative) before the
  * final ratio.
  */
object EventStats {

  // ---------------------------------------------------------------- q180

  /** q180: per-type Fano factor of hourly counts, permille. */
  def q180(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("event_type"), col("n_hours"), col("n_events"),
        expr("1000 * (n_hours * sum_c2 - n_events * n_events)" +
          " DIV (n_hours * n_events)").as("fano_permille"),
        expr("1000 * n_events DIV n_hours").as("mean_permille"))
      .orderBy(col("event_type"))

  val q180Oracle: String =
    """WITH hc AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
      |  FROM events GROUP BY event_type, h)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
      |       CAST(sum(c) AS BIGINT) AS n_events,
      |       CAST(1000 * (count(*) * sum(c * c) - sum(c) * sum(c))
      |            // (count(*) * sum(c)) AS BIGINT) AS fano_permille,
      |       CAST(1000 * sum(c) // count(*) AS BIGINT) AS mean_permille
      |FROM hc GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q181

  /** q181: purchases attributed to the user's most recent preceding
    * click within 30 min. `attributed` stays 0/1 int (driver hash).
    */
  def q181(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    table(spark, dir, "events")
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts")))
          .as("gap_us"),
        when(unix_micros(col("ts")) - unix_micros(col("click_ts"))
          <= 1800L * 1000000L, 1L).otherwise(0L).as("attributed"))
      .orderBy(col("purchase_id"))
  }

  val q181Oracle: String =
    """WITH t AS (
      |  SELECT event_id, user_id, ts, event_type,
      |         last_value(CASE WHEN event_type = 'click' THEN event_id END
      |           IGNORE NULLS) OVER w AS click_id,
      |         last_value(CASE WHEN event_type = 'click' THEN ts END
      |           IGNORE NULLS) OVER w AS click_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id, click_id,
      |       epoch_us(ts) - epoch_us(click_ts) AS gap_us,
      |       CAST(CASE WHEN epoch_us(ts) - epoch_us(click_ts)
      |                 <= 1800 * 1000000 THEN 1 ELSE 0 END AS BIGINT)
      |         AS attributed
      |FROM t WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q182

  /** q182: correlation of hourly volumes between event-type pairs over
    * a zero-filled hour spine (hours observed anywhere in the stream).
    */
  def q182(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    // OPTIMIZATION r16 (guide §2.4): counts is (hour × type)-domain
    // bounded; hours/types re-aggregate the CHECKPOINTED histogram
    // instead of each re-scanning the corpus (3 events scans -> 1).
    // Identical result: distinct h/type over counts == over ev.
    val counts = ev.groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val hours = counts.select(col("h")).distinct()
    val types = counts.select(col("event_type")).distinct()
    val filled = hours.crossJoin(broadcast(types))
      .join(counts, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = filled.toDF("h_a", "type_a", "c_a")
    val b = filled.toDF("h_b", "type_b", "c_b")
    // Pearson r from integer-exact moment SUMS instead of corr():
    // int64 sums are order-independent (bit-identical cross-engine
    // where corr()'s float co-moment accumulation is not; Σ c² stays
    // exact below ~10¹⁴ hour-cells), and the nullif'd denominator
    // returns NULL for a zero-variance series where ANSI corr() raises
    // DIVIDE_BY_ZERO mid-aggregation. The moment COMBINATION runs in
    // doubles: n·sxx in int64 wraps once n·max_c² nears 2⁶³ (skewed
    // hourly volumes breach that long before the sums do) while the
    // oracle's HUGEINT stays exact — BIGINT→DOUBLE casts and each */−
    // are single correctly-rounded IEEE ops, identical on both engines.
    // NOT broadcast (r16 audit): this is a SELF-join of `filled` — the
    // sort-merge join's two shuffle exchanges have identical children
    // and Catalyst unifies them (ReusedExchange: one evaluation, two
    // sorted reads), while a broadcast side would re-evaluate the
    // filled chain separately from the streamed side.
    a.join(b, col("h_a") === col("h_b") && col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n"), sum(col("c_a")).as("sx"),
        sum(col("c_b")).as("sy"),
        sum(col("c_a") * col("c_b")).as("sxy"),
        sum(col("c_a") * col("c_a")).as("sxx"),
        sum(col("c_b") * col("c_b")).as("syy"))
      .select(col("type_a"), col("type_b"), col("n").as("n_hours"),
        expr("""round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
                nullif(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                          * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                       0.0), 4)""")
          .as("volume_corr"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val q182Oracle: String =
    """WITH ev AS (
      |  SELECT date_trunc('hour', ts) AS h, event_type FROM events),
      |hours AS (SELECT DISTINCT h FROM ev),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |counts AS (SELECT h, event_type, count(*) AS c FROM ev
      |           GROUP BY h, event_type),
      |filled AS (
      |  SELECT hours.h, types.event_type, coalesce(counts.c, 0) AS c
      |  FROM hours CROSS JOIN types
      |  LEFT JOIN counts ON counts.h = hours.h
      |    AND counts.event_type = types.event_type),
      |m AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         count(*) AS n, sum(a.c) AS sx, sum(b.c) AS sy,
      |         sum(a.c * b.c) AS sxy, sum(a.c * a.c) AS sxx,
      |         sum(b.c * b.c) AS syy
      |  FROM filled a JOIN filled b
      |    ON a.h = b.h AND a.event_type < b.event_type
      |  GROUP BY type_a, type_b)
      |SELECT type_a, type_b, CAST(n AS BIGINT) AS n_hours,
      |       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |             nullif(sqrt((CAST(n AS DOUBLE) * sxx
      |                          - CAST(sx AS DOUBLE) * sx)
      |                       * (CAST(n AS DOUBLE) * syy
      |                          - CAST(sy AS DOUBLE) * sy)), 0.0), 4)
      |         AS volume_corr
      |FROM m ORDER BY type_a, type_b""".stripMargin

  // ---------------------------------------------------------------- q185

  /** q185: SCD-type-2 interval reconstruction — each event opens a
    * "current status" validity interval per user that the user's NEXT
    * event closes (`lead` over (ts, event_id)); open tail intervals are
    * excluded. Aggregated to per-type interval counts and exact µs
    * dwell totals: the temporal-table archetype (Snodgrass, "Developing
    * Time-Oriented Database Applications in SQL") the TPC-H matrix has
    * no shape for. One window pass partitioned by user; all durations
    * are integer µs (int64-safe below ~292 000 years).
    */
  def q185(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(unix_micros(col("next_ts")) - unix_micros(col("ts")))
          .as("total_us"))
      .select(col("event_type"), col("n_intervals"), col("total_us"),
        expr("total_us DIV n_intervals").as("mean_us"))
      .orderBy(col("event_type"))
  }

  val q185Oracle: String =
    """WITH iv AS (
      |  SELECT event_type, ts,
      |         lead(ts) OVER (PARTITION BY user_id
      |                        ORDER BY ts, event_id) AS next_ts
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
      |       CAST(sum(epoch_us(next_ts) - epoch_us(ts)) AS BIGINT)
      |         AS total_us,
      |       CAST(sum(epoch_us(next_ts) - epoch_us(ts)) // count(*)
      |         AS BIGINT) AS mean_us
      |FROM iv WHERE next_ts IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q188

  /** q188: gaps-and-islands — longest consecutive-active-day streak per
    * user. The island anchor is `day − row_number` over the user's
    * DISTINCT active days (equal-anchor days are consecutive): the
    * classic Tropashko dense-rank trick, integer/date-exact. Work is
    * bounded by distinct (user, day) pairs — the time×user domain, not
    * the event count.
    */
  def q188(spark: SparkSession, dir: String): DataFrame = {
    table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("anchor",
        expr("date_sub(day, row_number() OVER (PARTITION BY user_id" +
          " ORDER BY day))"))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_active_days"))
      .orderBy(col("user_id"))
  }

  val q188Oracle: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |isl AS (
      |  SELECT user_id, day,
      |         day - CAST(row_number() OVER (PARTITION BY user_id
      |                    ORDER BY day) AS INTEGER) AS anchor
      |  FROM days),
      |runs AS (
      |  SELECT user_id, anchor, count(*) AS len
      |  FROM isl GROUP BY user_id, anchor)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
      |       CAST(count(*) AS BIGINT) AS n_streaks,
      |       CAST(sum(len) AS BIGINT) AS n_active_days
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q193

  /** q193: rolling 7-day distinct active users per day. Windowed
    * DISTINCT has no native frame support in either engine, so the
    * rolling set is expressed as a bounded RANGE JOIN — day spine ×
    * (user, day) actives within 6 days back — which at scale beats any
    * collect-the-frame approach: the join blows the (user, day) frame
    * up by exactly 7× (the literal window), the distinct rides one
    * shuffle on the day key, and nothing ever materializes a per-day
    * user array (which at 10⁸ daily actives would be a straight OOM).
    */
  def q193(spark: SparkSession, dir: String): DataFrame = {
    val days = table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val spine = days.select(col("d").as("day")).distinct()
    spine.join(days,
        col("d") >= date_sub(col("day"), 6) && col("d") <= col("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_active_7d"),
        count(lit(1)).as("n_user_days"))
      .orderBy(col("day"))
  }

  val q193Oracle: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |spine AS (SELECT DISTINCT d AS day FROM days)
      |SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d,
      |       CAST(count(*) AS BIGINT) AS n_user_days
      |FROM spine JOIN days ON d >= day - 6 AND d <= day
      |GROUP BY day ORDER BY day""".stripMargin

  // ---------------------------------------------------------------- q194

  /** q194: A/B test (variant = user id parity) on mean purchase value,
    * as a Welch z-score from exact integer-cent moments: per variant
    * one pass accumulates (n, Σc, Σc²); s² = (n·Σc² − (Σc)²)/(n(n−1))
    * and z = (m_a − m_b)/√(s²_a/n_a + s²_b/n_b). Every double op in
    * that chain (+,−,×,÷,√) is IEEE-correctly-rounded — no libm
    * transcendental — so both engines compute the identical bits;
    * rounded to 4dp by convention anyway. A conversion-RATE test was
    * rejected deliberately: on this corpus every user purchases, the
    * pooled p hits 1 and the two-proportion denominator is √0. One
    * corpus aggregate, 2-row fold, single audit row out.
    */
  def q194(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).as("variant"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("cents") * col("cents")).as("s2"))
      .agg(
        sum(when(col("variant") === 0L, col("n"))).as("n_a"),
        sum(when(col("variant") === 0L, col("s"))).as("sum_a"),
        sum(when(col("variant") === 0L, col("s2"))).as("sum2_a"),
        sum(when(col("variant") === 1L, col("n"))).as("n_b"),
        sum(when(col("variant") === 1L, col("s"))).as("sum_b"),
        sum(when(col("variant") === 1L, col("s2"))).as("sum2_b"))
      .select(col("n_a"), col("sum_a"), col("n_b"), col("sum_b"),
        expr("sum_a DIV n_a").as("mean_a_cents"),
        expr("sum_b DIV n_b").as("mean_b_cents"),
        round(expr(
          "(CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b)" +
            " / sqrt(" +
            "(CAST(n_a AS DOUBLE) * sum2_a - CAST(sum_a AS DOUBLE) * sum_a)" +
            " / (CAST(n_a AS DOUBLE) * (n_a - 1)) / n_a +" +
            "(CAST(n_b AS DOUBLE) * sum2_b - CAST(sum_b AS DOUBLE) * sum_b)" +
            " / (CAST(n_b AS DOUBLE) * (n_b - 1)) / n_b)"), 4)
          .as("z_score"))

  val q194Oracle: String =
    """WITH v AS (
      |  SELECT user_id % 2 AS variant, count(*) AS n,
      |         sum(CAST(round(value * 100, 0) AS BIGINT)) AS s,
      |         sum(CAST(round(value * 100, 0) AS BIGINT)
      |             * CAST(round(value * 100, 0) AS BIGINT)) AS s2
      |  FROM events WHERE event_type = 'purchase' GROUP BY variant),
      |w AS (
      |  SELECT
      |    sum(CASE WHEN variant = 0 THEN n END) AS n_a,
      |    sum(CASE WHEN variant = 0 THEN s END) AS sum_a,
      |    sum(CASE WHEN variant = 0 THEN s2 END) AS sum2_a,
      |    sum(CASE WHEN variant = 1 THEN n END) AS n_b,
      |    sum(CASE WHEN variant = 1 THEN s END) AS sum_b,
      |    sum(CASE WHEN variant = 1 THEN s2 END) AS sum2_b
      |  FROM v)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(sum_a AS BIGINT) AS sum_a,
      |       CAST(n_b AS BIGINT) AS n_b, CAST(sum_b AS BIGINT) AS sum_b,
      |       CAST(sum_a // n_a AS BIGINT) AS mean_a_cents,
      |       CAST(sum_b // n_b AS BIGINT) AS mean_b_cents,
      |       round((CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b)
      |         / sqrt(
      |         (CAST(n_a AS DOUBLE) * sum2_a - CAST(sum_a AS DOUBLE) * sum_a)
      |           / (CAST(n_a AS DOUBLE) * (n_a - 1)) / n_a +
      |         (CAST(n_b AS DOUBLE) * sum2_b - CAST(sum_b AS DOUBLE) * sum_b)
      |           / (CAST(n_b AS DOUBLE) * (n_b - 1)) / n_b), 4) AS z_score
      |FROM w""".stripMargin

  // ---------------------------------------------------------------- q195

  /** q195: linear (equal-split) multi-touch attribution — q181's
    * single-winner policy generalized: each purchase splits its credit
    * equally across ALL of the user's clicks in the strictly-preceding
    * 30-minute RANGE frame (ordered by exact µs, so the frame bound is
    * a pure integer comparison). One window pass per user; per-row
    * state is the frame's conditional count, never a collected list.
    */
  def q195(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-1800L * 1000000L, -1L)
    table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_touches",
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("n_touches"),
        expr("CASE WHEN n_touches > 0 THEN 1000 DIV n_touches" +
          " ELSE 0 END").as("credit_permille"))
      .orderBy(col("purchase_id"))
  }

  val q195Oracle: String =
    """WITH t AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
      |         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |                 RANGE BETWEEN 1800000000 PRECEDING
      |                 AND 1 PRECEDING) AS n_touches
      |  FROM events)
      |SELECT event_id AS purchase_id, user_id,
      |       CAST(n_touches AS BIGINT) AS n_touches,
      |       CAST(CASE WHEN n_touches > 0 THEN 1000 // n_touches
      |            ELSE 0 END AS BIGINT) AS credit_permille
      |FROM t WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  // ---------------------------------------------------------------- q196

  /** q196: behavioral-entropy histogram — per user the Shannon entropy
    * of their event-type mix, H = ln n − (Σ c·ln c)/n, then users
    * bucketed into quarter-nat bins. The q190/q191 integer-micronat
    * discipline: each ln is rounded to integer micronats at the row it
    * is computed (one libm call per (user, type) row and one per user),
    * every fold after that is exact int64, so engines cannot drift on
    * summation order. Work: one (user, type) aggregate, one per-user
    * fold, and a bin-domain-sized histogram (≤ ~20 bins — entropy of a
    * 5-type mix caps at ln 5 ≈ 1.61 nats).
    */
  def q196(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("clnc_micro",
        expr("c * CAST(round(ln(c) * 1000000, 0) AS BIGINT)"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"), sum(col("clnc_micro")).as("s"))
      .select(
        expr("CAST(round(ln(n) * 1000000, 0) AS BIGINT) - s DIV n")
          .as("h_micro"))
      .select(expr("h_micro DIV 250000").as("bin"), col("h_micro"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_users"), min(col("h_micro")).as("min_h"),
        max(col("h_micro")).as("max_h"))
      .orderBy(col("bin"))

  val q196Oracle: String =
    """WITH ut AS (
      |  SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY user_id, event_type),
      |u AS (
      |  SELECT user_id, sum(c) AS n,
      |         sum(c * CAST(round(ln(c) * 1000000, 0) AS BIGINT)) AS s
      |  FROM ut GROUP BY user_id),
      |h AS (
      |  SELECT CAST(round(ln(n) * 1000000, 0) AS BIGINT)
      |           - CAST(s // n AS BIGINT) AS h_micro
      |  FROM u)
      |SELECT CAST(h_micro // 250000 AS BIGINT) AS bin,
      |       CAST(count(*) AS BIGINT) AS n_users,
      |       CAST(min(h_micro) AS BIGINT) AS min_h,
      |       CAST(max(h_micro) AS BIGINT) AS max_h
      |FROM h GROUP BY bin ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q197

  /** q197: weekly growth accounting — every active (user, week) is
    * exactly one of NEW (first week ever), RETAINED (also active the
    * prior week) or RESURRECTED (returning after a gap), and a prior-
    * week active missing this week is CHURNED into it; by construction
    * actives = new + retained + resurrected and the churn ledger
    * reconciles week over week. One (user, week) distinct frame drives
    * everything: a self-join shifted 7 days back classifies, a shifted
    * anti-join counts churn, both co-partitioned on user_id. The week
    * spine is time-domain-sized.
    */
  def q197(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: au feeds five differently-keyed consumers
    // (first-week agg, classification join, prev side, max-week scalar,
    // both churn sides) — without it each re-plans the events scan +
    // distinct shuffle (the q173/q189 shared-frame pattern)
    val au = table(spark, dir, "events")
      .select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
      .localCheckpoint()
    val first = au.groupBy(col("user_id")).agg(min(col("week")).as("fw"))
    val prev = au.toDF("p_user", "pweek")
    val classed = au
      .join(first, "user_id")
      .join(prev,
        col("user_id") === col("p_user") &&
          col("pweek") === date_sub(col("week"), 7), "left")
      .select(col("user_id"), col("week"),
        when(col("week") === col("fw"), "new")
          .when(col("pweek").isNotNull, "retained")
          .otherwise("resurrected").as("cls"))
    val perWeek = classed.groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val maxWeek = au.agg(max(col("week")).as("max_week"))
    val churn = au.toDF("c_user", "cweek")
      .join(au.toDF("n_user", "nweek"),
        col("c_user") === col("n_user") &&
          col("nweek") === date_add(col("cweek"), 7), "left_anti")
      .crossJoin(broadcast(maxWeek))
      .filter(date_add(col("cweek"), 7) <= col("max_week"))
      .groupBy(date_add(col("cweek"), 7).as("week"))
      .agg(count(lit(1)).as("n_churned"))
    perWeek.join(churn, Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy(col("week"))
  }

  val q197Oracle: String =
    """WITH au AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
      |    AS week FROM events),
      |f AS (SELECT user_id, min(week) AS fw FROM au GROUP BY user_id),
      |cls AS (
      |  SELECT au.user_id, au.week,
      |         CASE WHEN au.week = f.fw THEN 'new'
      |              WHEN p.user_id IS NOT NULL THEN 'retained'
      |              ELSE 'resurrected' END AS cls
      |  FROM au JOIN f ON f.user_id = au.user_id
      |  LEFT JOIN au p ON p.user_id = au.user_id
      |    AND p.week = au.week - 7),
      |pw AS (
      |  SELECT week, count(*) AS n_active,
      |         sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS n_new,
      |         sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
      |           AS n_retained,
      |         sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
      |           AS n_resurrected
      |  FROM cls GROUP BY week),
      |mw AS (SELECT max(week) AS max_week FROM au),
      |ch AS (
      |  SELECT p.week + 7 AS week, count(*) AS n_churned
      |  FROM au p CROSS JOIN mw
      |  WHERE p.week + 7 <= mw.max_week
      |    AND NOT EXISTS (SELECT 1 FROM au n
      |      WHERE n.user_id = p.user_id AND n.week = p.week + 7)
      |  GROUP BY p.week + 7)
      |SELECT pw.week, CAST(n_active AS BIGINT) AS n_active,
      |       CAST(n_new AS BIGINT) AS n_new,
      |       CAST(n_retained AS BIGINT) AS n_retained,
      |       CAST(n_resurrected AS BIGINT) AS n_resurrected,
      |       CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
      |FROM pw LEFT JOIN ch ON ch.week = pw.week
      |ORDER BY pw.week""".stripMargin

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

  // ---------------------------------------------------------------- q140

  /** Trailing window width in hours, and the minimum observed prior
    * buckets for a verdict — a burst against a near-empty baseline is
    * noise, not signal.
    */
  val BurstTrailingHours = 24
  val BurstMinPrior = 12

  /** Per-type hourly burst detection: an hour is a burst when its event
    * count exceeds 1.5× the mean of the trailing [[BurstTrailingHours]]
    * observed hour buckets (strictly — `2·cnt·n_prior > 3·sum_prior`,
    * integer cross-multiplication) with at least [[BurstMinPrior]]
    * prior buckets in range. The trailing window is a RANGE frame over
    * the integer hour index, so calendar gaps shrink the baseline
    * instead of silently stretching it across days (a ROWS frame
    * would). The multiplier is deliberately modest: per-bucket counts
    * grow with corpus rate while relative fluctuation shrinks as
    * 1/√n, so a 2× screen that fires on a sparse corpus goes silent
    * on a dense one (measured: 189 hits at sf0.01, ZERO at sf0.1; the
    * 1.5× screen fires at every SF). At very high rates the right
    * screen is a z-score — this query pins the integer-exact ratio
    * form.
    *
    * Scale shape: the corpus collapses to (type, hour) counts in one
    * map-side-partial aggregate; the range-frame window runs on that
    * compressed frame, partitioned by the event-type domain. Nothing
    * downstream of the first aggregate ever touches a raw event.
    */
  def q140(spark: SparkSession, dir: String): DataFrame = {
    val hourly = table(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rangeBetween(-BurstTrailingHours, -1)
    hourly
      .withColumn("sum_prior", sum(col("cnt")).over(w))
      .withColumn("n_prior", count(lit(1)).over(w))
      .filter(col("n_prior") >= BurstMinPrior &&
        lit(2L) * col("cnt") * col("n_prior") > lit(3L) * col("sum_prior"))
      .select(col("event_type"), col("hr"), col("cnt"), col("n_prior"),
        col("sum_prior"))
      .orderBy(col("event_type"), col("hr"))
  }

  val q140Oracle: String =
    s"""WITH h AS (
       |  SELECT event_type, epoch_ms(ts) // 3600000 AS hr,
       |         count(*) AS cnt
       |  FROM events GROUP BY event_type, hr),
       |w AS (
       |  SELECT event_type, hr, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY hr
       |                RANGE BETWEEN $BurstTrailingHours PRECEDING
       |                          AND 1 PRECEDING) AS BIGINT) AS sum_prior,
       |         count(*) OVER (PARTITION BY event_type ORDER BY hr
       |                RANGE BETWEEN $BurstTrailingHours PRECEDING
       |                          AND 1 PRECEDING) AS n_prior
       |  FROM h)
       |SELECT event_type, hr, cnt, n_prior, sum_prior
       |FROM w
       |WHERE n_prior >= $BurstMinPrior AND 2 * cnt * n_prior > 3 * sum_prior
       |ORDER BY event_type, hr""".stripMargin

  // ---------------------------------------------------------------- q141

  /** Behavioral transition matrix: counts of consecutive event-type
    * pairs within each user's timeline (ordered by ts with event_id as
    * the unique tie-break), with each transition's share of the total
    * in integer per-mille — the first-order Markov summary of the
    * event stream, and the batch twin of what a session-state monitor
    * accumulates incrementally.
    *
    * Scale shape: one shuffle on user_id for the lead() window; the
    * transition aggregate collapses to at most |types|² rows, and the
    * global total is a window over THAT frame (the q114 lesson — a
    * single-partition window over ≤25 rows, not a second corpus pass).
    */
  def q141(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(1000 * n) div total").as("share_permille"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q141Oracle: String =
    """WITH t AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type, 1) OVER (PARTITION BY user_id
      |                                   ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (
      |  SELECT from_type, to_type, count(*) AS n
      |  FROM t WHERE to_type IS NOT NULL
      |  GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      |       CAST((1000 * n) // (sum(n) OVER ()) AS BIGINT)
      |         AS share_permille
      |FROM c
      |ORDER BY from_type, to_type""".stripMargin

  // ---------------------------------------------------------------- q143

  /** Inter-arrival gap histogram: per-user event gaps (seconds between
    * consecutive events, ts-ordered with event_id tie-break) bucketed
    * by bit length — bucket k holds gaps in [2^(k-1), 2^k), the
    * doubling histogram that shows burst/idle structure across five
    * orders of magnitude in ~17 rows. Bit length is `length(bin(x))`:
    * the binary-string length both engines produce identically for
    * non-negative BIGINTs — no float log2 anywhere.
    *
    * Scale shape: one shuffle on user_id for the lag() window, then a
    * map-side-partial aggregate onto the ≤64-row bucket domain.
    */
  def q143(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .filter(col("prev_ms").isNotNull)
      .withColumn("gap_s", expr("(ms - prev_ms) div 1000"))
      .groupBy(length(bin(col("gap_s"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_s")).as("min_gap_s"),
        max(col("gap_s")).as("max_gap_s"))
      .orderBy(col("bucket"))
  }

  val q143Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, epoch_ms(ts) AS ms FROM events),
      |f AS (
      |  SELECT ms, lag(ms, 1) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) AS prev_ms
      |  FROM e),
      |g AS (
      |  SELECT (ms - prev_ms) // 1000 AS gap_s
      |  FROM f WHERE prev_ms IS NOT NULL)
      |SELECT CAST(length(bin(gap_s)) AS BIGINT) AS bucket,
      |       count(*) AS n_gaps,
      |       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
      |       CAST(max(gap_s) AS BIGINT) AS max_gap_s
      |FROM g GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q58

  /** Time-weighted average of a sensor-style value per user: each
    * reading is weighted by how long it was current (millis to the next
    * event, exact integer deltas from lag/lead), last reading dropped.
    * One shuffle on user_id serves both the window and the aggregate.
    */
  def q58(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .filter(col("user_id") % 5 === 0)
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("dt", lead(col("ms"), 1).over(w) - col("ms"))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("span_ms"),
        // numerator exact-summed, unrounded (see Exact's scaladoc): a
        // TWA is a fine-grid rational, so rounding boundaries can be
        // hit exactly. Group sums of value·dt stay < 2^53/100 (dt is
        // bounded by the corpus time span), so the long→double
        // conversion is exact and the quotient bit-identical.
        (Exact.sumFixed(col("value") * col("dt"), 2) / sum(col("dt")))
          .as("twa"))
      .orderBy(col("user_id"))
  }

  val q58Oracle: String =
    s"""WITH e AS (
      |  SELECT user_id, value, epoch_ms(ts) AS ms,
      |         lead(epoch_ms(ts), 1) OVER (PARTITION BY user_id
      |                                     ORDER BY ts, event_id) AS next_ms
      |  FROM events WHERE user_id % 5 = 0)
      |SELECT user_id, count(*) AS n_intervals,
      |       CAST(sum(next_ms - ms) AS BIGINT) AS span_ms,
      |       ${Exact.sumFixedSql("value * (next_ms - ms)", 2)}
      |         / sum(next_ms - ms) AS twa
      |FROM e WHERE next_ms IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_behavior_entropy" -> (q196 _),
    "q197_growth_accounting" -> (q197 _),
    "q180_fano_burstiness" -> (q180 _),
    "q181_last_touch" -> (q181 _),
    "q182_event_corr" -> (q182 _),
    "q185_scd2_intervals" -> (q185 _),
    "q188_activity_streaks" -> (q188 _),
    "q193_rolling_actives" -> (q193 _),
    "q194_ab_test" -> (q194 _),
    "q195_linear_attribution" -> (q195 _),
    "q135_decay_score" -> (q135 _),
    "q136_funnel_ordered" -> (q136 _),
    "q140_burst_hours" -> (q140 _),
    "q141_event_transitions" -> (q141 _),
    "q143_gap_histogram" -> (q143 _),
    "q58_time_weighted_avg" -> (q58 _))

  val oracles: Map[String, String] = Map(
    "q196_behavior_entropy" -> q196Oracle,
    "q197_growth_accounting" -> q197Oracle,
    "q180_fano_burstiness" -> q180Oracle,
    "q181_last_touch" -> q181Oracle,
    "q182_event_corr" -> q182Oracle,
    "q185_scd2_intervals" -> q185Oracle,
    "q188_activity_streaks" -> q188Oracle,
    "q193_rolling_actives" -> q193Oracle,
    "q194_ab_test" -> q194Oracle,
    "q195_linear_attribution" -> q195Oracle,
    "q135_decay_score" -> q135Oracle,
    "q136_funnel_ordered" -> q136Oracle,
    "q140_burst_hours" -> q140Oracle,
    "q141_event_transitions" -> q141Oracle,
    "q143_gap_histogram" -> q143Oracle,
    "q58_time_weighted_avg" -> q58Oracle)
}
