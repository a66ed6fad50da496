package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Event-stream operators (SURVEY.md §2.3 E7): tumbling-window rollups
  * (q20, the batch twin of the Structured Streaming path in
  * `graft.streaming`) and gap-based sessionization (q31).
  */
object Events {

  // ---------------------------------------------------------------- q20

  /** 1-hour tumbling windows per event type. Batch twin uses
    * `date_trunc` so the DuckDB oracle runs the same SQL; the streaming
    * variant (`window($"ts", "1 hour")` + watermark) is exercised in
    * engine tests.
    *
    * Sums use [[Exact.sumFixed]] (order-independent unscaled-BIGINT
    * sums, emitted unrounded — see Exact's scaladoc): `value` is 2dp
    * data, so group means land mathematically ON .00005 rounding
    * boundaries, where double sum order and round() tie-breaking both
    * diverge across engines (observed here at sf0.1 — the flake that
    * motivated the helper).
    */
  def q20(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_window"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.sumFixed(col("value"), 2).as("sum_value"),
        (Exact.sumFixed(col("value"), 2) / count(lit(1))).as("avg_value"))
      .orderBy(col("hour_window"), col("event_type"))

  val q20Oracle: String =
    s"""SELECT date_trunc('hour', ts) AS hour_window, event_type,
      |       count(*) AS n_events,
      |       ${Exact.sumFixedSql("value", 2)} AS sum_value,
      |       ${Exact.sumFixedSql("value", 2)} / count(*) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q31

  /** Gap-based sessionization: a >30-min silence starts a new session.
    * lag + running sum over a per-user window — the classic pattern;
    * shuffles once on user_id and stays partitioned for both windows
    * and the final per-session aggregate (single exchange reused).
    */
  def q31(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ms")) - min(col("ms"))).as("duration_ms"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q31Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, epoch_ms(ts) AS ms FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts, ms,
      |         lag(ms, 1) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev_ms
      |  FROM e),
      |g AS (
      |  SELECT user_id, event_id, ts, ms,
      |         CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM f),
      |s AS (
      |  SELECT user_id, ms,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q265

  /** q265: NATIVE `session_window` sessionization (VERDICT r14 item 6 —
    * the one stateful-window API previously without a twin; q31 builds
    * the same sessions manually via lag + running sum). Boundary
    * semantics, pinned empirically by SessionWindowSpec's exact-gap
    * fixture: an event at EXACTLY `last_ts + gap` still MERGES —
    * Spark's session merge is windows-overlap-or-TOUCH (`ts <= end`),
    * not strict overlap — so session_window agrees with q31's
    * `diff > gap` lag rule at the boundary, and the oracle sessionizes
    * with `diff > gap`. Everything runs in epoch MICROS (Spark's
    * native timestamp precision): comparing at millis would floor each
    * endpoint separately and could flip the boundary test for sub-ms
    * phases. Session bounds are emitted as epoch micros — start =
    * first event ts, end = LAST event ts + gap (the session_window
    * struct's contract; q31 reports duration = last − first instead).
    *
    * Scale shape: one shuffle on the session_window/user_id grouping —
    * the batch planner rewrites session_window into a sort-based merge
    * within partitions (SessionWindowStateStoreRestore is
    * streaming-only), so no window-function pass and no second
    * exchange before the final sort. The streaming twin (watermark +
    * `session_window` + append mode) runs under the soak protocol in
    * SessionWindowSpec with bounded per-user session state.
    */
  def q265(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  val q265Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |f AS (
      |  SELECT user_id, us, event_id,
      |         lag(us, 1) OVER (PARTITION BY user_id
      |                          ORDER BY us, event_id) AS prev_us
      |  FROM e),
      |g AS (
      |  SELECT user_id, us, event_id,
      |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM f),
      |s AS (
      |  SELECT user_id, us,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, CAST(min(us) AS BIGINT) AS session_start_us,
      |       CAST(max(us) + 1800000000 AS BIGINT) AS session_end_us,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  // ---------------------------------------------------------------- q267

  /** q267: the `flatMapGroupsWithState` sessionizer under the oracle
    * gate (VERDICT r15 item 7) — [[graft.streaming.StatefulSessionize]]
    * run in BATCH mode over the events table, certified cross-engine
    * against a SQL sessionization. q31 gates the declarative
    * lag+running-sum form and q265 the native `session_window`
    * aggregate; this gates the ARBITRARY-STATE API those two cannot
    * express (dynamic gaps, custom emission) — the same `process`
    * function the streaming twin runs, so the gate pins the exact
    * per-event fold the stream executes.
    *
    * Batch-emission contract (the documented fMGWS batch semantics):
    * state is discarded at batch end and timeouts never fire, so each
    * user's final OPEN session is not emitted — exactly append-mode
    * streaming's undelivered tail. The oracle mirrors it by dropping
    * each user's last session (`session_id < max(session_id)`).
    * All-integer output (counts, ms durations) — hash-exact.
    *
    * Scale shape: ONE shuffle (groupByKey on user_id); per-group state
    * is O(1) (the open session + a counter), per-group work is the
    * sorted event fold — the mapGroups cost model, linear in events.
    */
  def q267(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = table(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"))
      .as[graft.streaming.StatefulSessionize.SessionEvent]
    graft.streaming.StatefulSessionize.sessionize(evs)
      .toDF()
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q267Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
      |f AS (
      |  SELECT user_id, event_id, ms,
      |         lag(ms, 1) OVER (PARTITION BY user_id
      |                          ORDER BY ms, event_id) AS prev_ms
      |  FROM e),
      |g AS (
      |  SELECT user_id, event_id, ms,
      |         CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM f),
      |s AS (
      |  SELECT user_id, ms,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |sess AS (
      |  SELECT user_id, sid, count(*) AS n_events,
      |         max(ms) - min(ms) AS duration_ms
      |  FROM s GROUP BY user_id, sid)
      |SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
      |       CAST(n_events AS BIGINT) AS n_events,
      |       CAST(duration_ms AS BIGINT) AS duration_ms
      |FROM (SELECT *, max(sid) OVER (PARTITION BY user_id) AS mx FROM sess)
      |WHERE sid < mx
      |ORDER BY user_id, session_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_events_tumbling" -> (q20 _),
    "q31_sessionize" -> (q31 _),
    "q265_session_window" -> (q265 _),
    "q267_fmgws_sessionize" -> (q267 _))

  val oracles: Map[String, String] = Map(
    "q20_events_tumbling" -> q20Oracle,
    "q31_sessionize" -> q31Oracle,
    "q265_session_window" -> q265Oracle,
    "q267_fmgws_sessionize" -> q267Oracle)
}
