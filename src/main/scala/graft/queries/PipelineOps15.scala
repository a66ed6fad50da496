package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Round-10 pack #2: dynamic partition pruning under the gate (q215)
  * and FORCAST readability scoring (q217) — a physical-layout scale
  * knob and a text-quality signal the 214-query surface lacked.
  */
object PipelineOps15 {

  // ---------------------------------------------------------------- q215

  /** q215: DYNAMIC partition pruning under the gate — the third member
    * of the physical-layout family (q47 salting, q90 z-order, q214
    * bucketing): customer is written `partitionBy(c_nationkey)` (the
    * Hive-style serving layout), then joined to nation filtered by
    * region. The nation filter is NOT a literal predicate on the fact
    * table, so static partition pruning can't help; Spark's
    * PartitionPruning rule instead feeds the broadcast dim's key set
    * into the fact scan at RUNTIME (`PartitionFilters:
    * [dynamicpruning#...]` — ScaleOpsSpec pins the marker in the
    * executed plan), so only the ~1/5 of partition directories whose
    * nationkey survives the region filter are read at all. At 100 TB
    * with date- or tenant-partitioned facts this is the dominant scan
    * eliminator: the query reads the partitions the dim filter selects,
    * never the whole table. The oracle runs the PLAIN join over the
    * original parquet — identical output certifies the partitioned
    * layout + DPP as a pure physical choice, exactly the q47/q214
    * contract.
    */
  def q215(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files
      .createTempDirectory("graft-q215-dpp").toString
    table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
      .write.partitionBy("c_nationkey").mode("overwrite").parquet(base)
    val fact = spark.read.parquet(base)
    val dim = table(spark, dir, "nation")
      .filter(col("n_regionkey") === 1)
    fact
      .join(dim, fact("c_nationkey") === dim("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_custs"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .orderBy(col("n_name"))
  }

  val q215Oracle: String =
    """SELECT n_name, count(*) AS n_custs,
      |       round(sum(c_acctbal), 2) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_regionkey = 1
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q217

  /** q217: FORCAST readability per language — the readability formula
    * built for text WITHOUT sentence structure (technical material;
    * Caylor & Sticht 1973), which is exactly this corpus's shape (no
    * sentence punctuation, so Flesch/Kincaid's words-per-sentence term
    * is undefined). Grade = 20 − N/10 where N = monosyllabic words per
    * 150-word sample; in integer milli-grades over a whole doc:
    * `20000 − (15000·mono) DIV words`. Syllables are vowel-group runs
    * (`[aeiouy]+`) — the standard dictionary-free approximation — so
    * the whole score is EXACT integer arithmetic over two counts and
    * the hash gate certifies the scoring itself, not a float proxy.
    *
    * Scale shape: one narrow pass (split → per-token vowel-run count
    * via regexp_extract_all, all inside whole-stage codegen), a per-doc
    * aggregate on the doc_id partitioning the explode already has, and
    * a final rollup landing on the language domain. Zero joins; at
    * 100 TB this runs at scan speed.
    */
  def q217(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), col("lang"),
        explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("lang"),
        size(expr("regexp_extract_all(tok, '[aeiouy]+', 0)"))
          .cast("long").as("sylls"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        count(lit(1)).as("words"),
        sum(col("sylls")).as("sylls"),
        sum(when(col("sylls") === 1L, 1L).otherwise(0L)).as("mono"))
      .withColumn("grade_milli",
        lit(20000L) - expr("(15000 * mono) DIV words"))
    perDoc
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("words")).as("n_words"),
        sum(col("sylls")).as("n_syllables"),
        sum(col("mono")).as("n_monosyllabic"),
        expr("(1000 * sum(mono)) DIV sum(words)").as("mono_permille"),
        expr("sum(grade_milli) DIV count(1)").as("avg_grade_milli"))
      .orderBy(col("lang"))
  }

  val q217Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      |  FROM documents),
      |sy AS (
      |  SELECT doc_id, lang,
      |         len(regexp_extract_all(tok, '[aeiouy]+')) AS sylls
      |  FROM toks),
      |perdoc AS (
      |  SELECT doc_id, lang,
      |         count(*) AS words,
      |         CAST(sum(sylls) AS BIGINT) AS sylls,
      |         CAST(sum(CASE WHEN sylls = 1 THEN 1 ELSE 0 END) AS BIGINT) AS mono
      |  FROM sy GROUP BY doc_id, lang),
      |graded AS (
      |  SELECT lang, words, sylls, mono,
      |         20000 - (15000 * mono) // words AS grade_milli
      |  FROM perdoc)
      |SELECT lang,
      |       count(*) AS n_docs,
      |       CAST(sum(words) AS BIGINT) AS n_words,
      |       CAST(sum(sylls) AS BIGINT) AS n_syllables,
      |       CAST(sum(mono) AS BIGINT) AS n_monosyllabic,
      |       CAST((1000 * sum(mono)) // sum(words) AS BIGINT) AS mono_permille,
      |       CAST(sum(grade_milli) // count(*) AS BIGINT) AS avg_grade_milli
      |FROM graded GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_dynamic_pruning" -> (q215 _),
    "q217_readability" -> (q217 _))

  val oracles: Map[String, String] = Map(
    "q215_dynamic_pruning" -> q215Oracle,
    "q217_readability" -> q217Oracle)
}
