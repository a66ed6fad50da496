package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q140-q143: round-7 widening — event-stream monitoring shapes
  * (trailing-window burst detection, behavioral transition counts,
  * inter-arrival distribution) and the shingle-uniqueness curation
  * score. Round-6 discipline throughout: integer-only thresholds
  * (cross-multiplication, never division), bit-length bucketing via
  * `bin()` string length (exact in both engines — no float log2),
  * every output under a total ORDER BY.
  */
object PipelineOps11 {

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

  // ---------------------------------------------------------------- q142

  /** How many docs the uniqueness screen reports. */
  val UniqTopK = 25

  /** Shingle-uniqueness score: per document, the per-mille of its
    * distinct 5-token shingles that occur in NO other document —
    * near 0 flags boilerplate/templated text a dedup pass should
    * inspect, near 1000 flags novel content worth keeping. The
    * uniqueness twin of q121's release-novelty score (which compares
    * two snapshots; this ranks docs within one corpus). Reported as
    * the [[UniqTopK]] LEAST-unique docs (ascending): the fully-unique
    * end saturates at 1000‰ on any healthy corpus, while the
    * boilerplate end is where a curation pass acts — and where the
    * scores actually discriminate (pinned by ArchetypePack2Spec).
    *
    * Scale shape: per-doc-distinct shingles hashed to 8-byte keys by
    * the native expression BEFORE the one shuffle-on-h, where the
    * document frequency rides as a window count
    * ([[Shingles.hashesWithDf]] — no groupBy+join-back second corpus
    * pass); the per-doc rollup then shuffles only (doc_id, df-class)
    * partial counts. Uniqueness is hash-exact in both engines (both
    * classify the same 60-bit keys), so no collision contract is
    * needed in the oracle.
    */
  def q142(spark: SparkSession, dir: String): DataFrame =
    Shingles.hashesWithDf(table(spark, dir, "documents"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        expr("(1000 * n_unique) div n_shingles").as("uniq_permille"))
      .orderBy(col("uniq_permille"), col("doc_id"))
      .limit(UniqTopK)

  val q142Oracle: String =
    "WITH " + Shingles.rareCteSql + ",\n" +
      s"""dfd AS (
         |  SELECT doc_id, count(*) OVER (PARTITION BY hh) AS df FROM hs),
         |sc AS (
         |  SELECT doc_id, count(*) AS n_shingles,
         |         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_unique
         |  FROM dfd GROUP BY doc_id)
         |SELECT doc_id, n_shingles, n_unique,
         |       CAST((1000 * n_unique) // n_shingles AS BIGINT)
         |         AS uniq_permille
         |FROM sc
         |ORDER BY uniq_permille, doc_id
         |LIMIT $UniqTopK""".stripMargin

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q140_burst_hours" -> (q140 _),
    "q141_event_transitions" -> (q141 _),
    "q142_shingle_uniqueness" -> (q142 _),
    "q143_gap_histogram" -> (q143 _))

  val oracles: Map[String, String] = Map(
    "q140_burst_hours" -> q140Oracle,
    "q141_event_transitions" -> q141Oracle,
    "q142_shingle_uniqueness" -> q142Oracle,
    "q143_gap_histogram" -> q143Oracle)
}
