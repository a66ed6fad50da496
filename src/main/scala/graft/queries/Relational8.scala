package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.{sqlWithViews, table}

/** q70-q71: IGNORE NULLS carry-forward fill and ordered listagg — the
  * last two window/aggregation spellings the inventory lacked.
  */
object Relational8 {

  // ---------------------------------------------------------------- q70

  /** Last-observation-carried-forward (sensor gap fill): null out a
    * deterministic subset of readings, then fill each hole with the most
    * recent non-null value via `last_value ... IGNORE NULLS` over a
    * running frame. One shuffle on user_id; the filled value is a PICKED
    * raw double, so no rounding is needed cross-engine. (Spark spells the
    * modifier `last_value(v) IGNORE NULLS`, DuckDB `last_value(v IGNORE
    * NULLS)` — same semantics.)
    */
  def q70(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "events" -> "events_v70")(
      """SELECT user_id, event_id, v_sparse,
        |       last_value(v_sparse) IGNORE NULLS OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS v_filled
        |FROM (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
        |           AS v_sparse
        |  FROM events_v70 WHERE user_id % 10 = 0)
        |ORDER BY user_id, event_id""".stripMargin)

  val q70Oracle: String =
    """SELECT user_id, event_id, v_sparse,
      |       last_value(v_sparse IGNORE NULLS) OVER
      |         (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS v_filled
      |FROM (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
      |           AS v_sparse
      |  FROM events WHERE user_id % 10 = 0)
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- q71

  /** Ordered string aggregation via listagg WITHIN GROUP — the direct
    * spelling of what q35 builds manually (sort_array + array_join).
    * The explicit ORDER BY inside the aggregate is what makes it
    * deterministic; bare listagg concatenates in arrival order.
    */
  def q71(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "customer" -> "customer_v71")(
      """SELECT c_mktsegment,
        |       listagg(CAST(c_custkey AS STRING), ',')
        |         WITHIN GROUP (ORDER BY c_custkey) AS keys,
        |       count(*) AS n
        |FROM customer_v71
        |WHERE c_custkey % 199 = 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)

  val q71Oracle: String =
    """SELECT c_mktsegment,
      |       string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)
      |         AS keys,
      |       count(*) AS n
      |FROM customer
      |WHERE c_custkey % 199 = 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q74

  /** The custom as-of join OPERATOR (graft.plans.AsOfJoin: logical node →
    * injected strategy → sort-merge-shaped AsOfJoinExec) under the oracle
    * gate, hash-matched against DuckDB's native ASOF LEFT JOIN. q36 is
    * the window-composed spelling; this is the first-class one — same
    * semantics certified by two independent engines and two independent
    * formulations.
    */
  def q74(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // defensive (idempotent): a session built without GraftExtensions —
    // e.g. a bare test builder that getOrCreate'd first in the JVM —
    // has no planner strategy for the custom node and q74 cannot plan
    graft.GraftExtensions.register(spark)
    val ev = table(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    // Dedupe the right side on (key, ts) keeping max event_id — the same
    // pick the operator's tie rule would make. Hash parity with DuckDB's
    // ASOF (which guarantees nothing on ties) requires a unique right
    // side; enforcing it here makes the precondition structural instead
    // of a property of today's corpus. Partial aggregation keeps the
    // extra pre-shuffle cheap at scale.
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max(col("event_id")).as("c_id"))
    graft.plans.AsOf.join(purchases, clicks, "user_id", "c_user", "p_ts", "c_ts",
      strictUnique = true)
      .select(col("user_id"), col("p_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
      .orderBy(col("user_id"), col("p_id"))
  }

  val q74Oracle: String =
    """SELECT p.user_id, p.p_id, p.p_ts, c.c_id, c.c_ts
      |FROM (SELECT user_id, event_id AS p_id, ts AS p_ts
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id AS c_user, ts AS c_ts, max(event_id) AS c_id
      |      FROM events WHERE event_type = 'click'
      |      GROUP BY user_id, ts) c
      |  ON p.user_id = c.c_user AND c.c_ts <= p.p_ts
      |ORDER BY p.user_id, p.p_id""".stripMargin

  // ---------------------------------------------------------------- q75

  /** Semi-structured processing through Spark 4's VARIANT type:
    * parse_json once into the binary variant encoding, then typed
    * variant_get extraction — the modern replacement for per-field JSON
    * re-parsing (q41 covers the from_json schema-ful spelling). All
    * outputs are exact integers.
    */
  def q75(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "events" -> "events_v75")(
      """WITH v AS (
        |  SELECT event_type,
        |         variant_get(parse_json(props), '$.k', 'int') AS k
        |  FROM events_v75)
        |SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k,
        |       CAST(max(k) AS BIGINT) AS max_k,
        |       CAST(count(CASE WHEN k >= 50 THEN 1 END) AS BIGINT) AS n_high
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin)

  val q75Oracle: String =
    """WITH v AS (
      |  SELECT event_type,
      |         CAST(json_extract(props, '$.k') AS INTEGER) AS k
      |  FROM events)
      |SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(min(k) AS BIGINT) AS min_k,
      |       CAST(max(k) AS BIGINT) AS max_k,
      |       CAST(count(CASE WHEN k >= 50 THEN 1 END) AS BIGINT) AS n_high
      |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_carry_forward" -> (q70 _),
    "q71_listagg" -> (q71 _),
    "q74_asof_operator" -> (q74 _),
    "q75_variant_json" -> (q75 _))

  val oracles: Map[String, String] = Map(
    "q70_carry_forward" -> q70Oracle,
    "q71_listagg" -> q71Oracle,
    "q74_asof_operator" -> q74Oracle,
    "q75_variant_json" -> q75Oracle)
}
