package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash

/** q50/q52/q56-q58: training-data pipeline operators, round 2 —
  * int8 embedding quantization, edit-distance similarity, deterministic
  * stratified sampling, blocklist anti-join dedup, and time-weighted
  * averaging over event streams.
  */
object PipelineOps {

  // ---------------------------------------------------------------- q50

  /** Symmetric int8 quantization of embeddings: per-vector scale
    * 127/max|x|, element quantize floor(x*scale + 0.5) (round-half-up —
    * identical in both engines, unlike round()), then integer summary
    * stats. All outputs after the quantize are EXACT integer arithmetic,
    * so the hash compare certifies the quantized vectors themselves, not
    * a rounded proxy. maxabs is surfaced raw: abs/max only select parquet
    * values, no arithmetic to diverge. Zero-shuffle narrow map + final
    * sort; at 100 TB this runs at scan speed per partition.
    */
  def q50(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0)
      .withColumn("vd", expr("transform(embedding, e -> cast(e as double))"))
      .withColumn("maxabs",
        expr("aggregate(vd, 0d, (acc, e) -> greatest(acc, abs(e)))"))
      .withColumn("scale", lit(127.0) / greatest(col("maxabs"), lit(1e-30)))
      .withColumn("q",
        expr("transform(vd, e -> cast(floor(e * scale + 0.5d) as bigint))"))
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        size(col("q")).cast("long").as("n_dims"),
        expr("aggregate(q, 0L, (a, e) -> a + e)").as("sum_q"),
        expr("aggregate(q, 0L, (a, e) -> a + abs(e))").as("sum_abs_q"),
        expr("array_max(q)").as("max_q"),
        col("maxabs"))
      .orderBy(col("vec_id"))

  val q50Oracle: String =
    """WITH v AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS vd
      |  FROM embeddings WHERE vec_id % 4 = 0),
      |m AS (
      |  SELECT vec_id, label, vd,
      |         list_max(list_transform(vd, e -> abs(e))) AS maxabs
      |  FROM v),
      |q AS (
      |  SELECT vec_id, label, maxabs,
      |         list_transform(vd, e ->
      |           CAST(floor(e * (127.0 / greatest(maxabs, 1e-30)) + 0.5)
      |                AS BIGINT)) AS qv
      |  FROM m)
      |SELECT vec_id, CAST(label AS BIGINT) AS label,
      |       CAST(len(qv) AS BIGINT) AS n_dims,
      |       CAST(list_sum(qv) AS BIGINT) AS sum_q,
      |       CAST(list_sum(list_transform(qv, e -> abs(e))) AS BIGINT)
      |         AS sum_abs_q,
      |       CAST(list_max(qv) AS BIGINT) AS max_q,
      |       maxabs
      |FROM q ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q52

  /** Per-brand membership cap for q52's blocks — brand COUNT is a
    * constant of the data model (~25 values), so without a cap each
    * block grows linearly with the corpus and the levenshtein pass is
    * quadratic (round 9 measured 7.6× wall at 10× data). The cap
    * bounds every block's pair fan-out at cap·(cap−1)/2; lowest part
    * keys keep their seat (deterministic), mirrored verbatim in the
    * oracle's QUALIFY — the [[Dedup.MaxBucketDocs]] hot-bucket
    * discipline applied to entity-resolution blocking.
    */
  private[graft] val Q52BrandCap = 40

  /** Edit-distance similarity inside brand blocks: levenshtein over
    * same-brand part-name pairs. Blocking on p_brand keeps the self-join
    * quadratic only within each block (the standard entity-resolution
    * trick — at 100 TB you never levenshtein the full cross product);
    * the key inequality halves the pairs, and block membership is
    * bounded by [[Q52BrandCap]] so total pair volume is brands × cap² —
    * constant per brand at any corpus size.
    */
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part")
      .filter(col("p_partkey") % 13 === 0)
      .select(col("p_partkey"), col("p_brand"), col("p_name"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))))
      .filter(col("rn") <= Q52BrandCap)
      .drop("rn")
    val a = p.toDF("key_a", "brand", "name_a")
    val b = p.toDF("key_b", "brand_b", "name_b")
    a.join(b, col("brand") === col("brand_b") && (col("key_a") < col("key_b")))
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("edit_dist") <= 25)
      .select(col("brand"), col("key_a"), col("key_b"), col("edit_dist"))
      .orderBy(col("brand"), col("key_a"), col("key_b"))
  }

  val q52Oracle: String =
    s"""WITH p AS (
      |  SELECT p_partkey, p_brand, p_name
      |  FROM part WHERE p_partkey % 13 = 0
      |  QUALIFY row_number() OVER (PARTITION BY p_brand
      |                             ORDER BY p_partkey) <= $Q52BrandCap)
      |SELECT a.p_brand AS brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
      |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
      |FROM p a JOIN p b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 25
      |ORDER BY brand, key_a, key_b""".stripMargin

  // ---------------------------------------------------------------- q56

  /** Deterministic stratified sampling — the reproducible alternative to
    * rand()-based sampling for training-data curation: keep a row iff
    * h60(salt || doc_id) % 100 < rate(lang), with per-language rates
    * (downsample the dominant language, keep the scarce ones). Pure
    * narrow filter — no shuffle, no RNG state, stable under retries,
    * partition-order independent: exactly what a 100 TB curation job
    * needs for resumability. sum(doc_id) pins the exact membership.
    */
  private val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 30, "de" -> 60, "es" -> 60, "fr" -> 60, "zh" -> 90)

  def q56(spark: SparkSession, dir: String): DataFrame = {
    val rate = SampleRates.foldRight(lit(50): org.apache.spark.sql.Column) {
      case ((l, r), acc) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    table(spark, dir, "documents")
      .withColumn("bucket",
        CrossHash.h60(concat(lit("smp:"), col("doc_id").cast("string"))) % 100)
      .filter(col("bucket") < rate)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("id_min"),
        max(col("doc_id")).as("id_max"))
      .orderBy(col("lang"))
  }

  val q56Oracle: String = {
    val h = CrossHash.h60Sql("'smp:' || CAST(doc_id AS VARCHAR)")
    val rate = SampleRates
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString("CASE ", " ", " ELSE 50 END")
    s"""SELECT lang, count(*) AS n_sampled,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       min(doc_id) AS id_min, max(doc_id) AS id_max
       |FROM documents
       |WHERE ($h) % 100 < ($rate)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q57

  /** Blocklist dedup: drop every document whose exact text fingerprint
    * appears in a blocklist (here: all of src0/src1), via broadcast LEFT
    * ANTI join on md5(text). The blocklist is the small side by
    * construction (fingerprints only, deduplicated), so at 100 TB this is
    * a map-side anti join — no shuffle of the corpus.
    */
  def q57(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val block = docs
      .filter(col("source").isin("src0", "src1"))
      .select(md5(col("text")).as("bh"))
      .distinct()
    docs
      .join(broadcast(block), md5(col("text")) === col("bh"), "left_anti")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("source"))
  }

  val q57Oracle: String =
    """WITH block AS (
      |  SELECT DISTINCT md5(text) AS bh FROM documents
      |  WHERE source IN ('src0', 'src1'))
      |SELECT source, count(*) AS n_kept,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM documents d
      |WHERE NOT EXISTS (SELECT 1 FROM block b WHERE b.bh = md5(d.text))
      |GROUP BY source ORDER BY source""".stripMargin

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
    "q50_embedding_quantize" -> (q50 _),
    "q52_edit_distance" -> (q52 _),
    "q56_stratified_sample" -> (q56 _),
    "q57_blocklist_antijoin" -> (q57 _),
    "q58_time_weighted_avg" -> (q58 _))

  val oracles: Map[String, String] = Map(
    "q50_embedding_quantize" -> q50Oracle,
    "q52_edit_distance" -> q52Oracle,
    "q56_stratified_sample" -> q56Oracle,
    "q57_blocklist_antijoin" -> q57Oracle,
    "q58_time_weighted_avg" -> q58Oracle)
}
