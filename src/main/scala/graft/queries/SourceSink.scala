package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.{sqlWithViews, table}

/** q82-q86: string/conditional scalar gauntlets, max_by/min_by, and
  * CSV/JSON round-trip proofs that put the non-parquet sources and
  * sinks under the DuckDB oracle gate.
  */
object SourceSink {

  // ---------------------------------------------------------------- q82

  /** String-function gauntlet #2 (q13 covered the basics): pad, repeat,
    * reverse, translate, left/right, split_part, instr, starts/ends,
    * ascii/chr. All names and semantics line up across engines
    * (both `instr` are 1-based, both pads truncate-or-fill).
    */
  def q82(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "customer" -> "customer_v82")(
      """SELECT c_custkey,
        |       lpad(c_mktsegment, 12, '.') AS seg_l,
        |       rpad(c_mktsegment, 12, '.') AS seg_r,
        |       repeat(left(c_name, 2), 3) AS rep2,
        |       reverse(c_name) AS rev_name,
        |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
        |       right(c_name, 4) AS name_tail,
        |       split_part(c_name, '#', 2) AS name_num,
        |       CAST(instr(c_name, '0') AS BIGINT) AS zero_pos,
        |       CAST(startswith(c_mktsegment, 'BU') AS INT) AS is_bu,
        |       CAST(endswith(c_mktsegment, 'RY') AS INT) AS is_ry,
        |       CAST(ascii(c_mktsegment) AS BIGINT) AS first_code,
        |       chr(CAST(65 + c_custkey % 26 AS INT)) AS key_chr
        |FROM customer_v82 WHERE c_custkey % 37 = 0
        |ORDER BY c_custkey""".stripMargin)

  val q82Oracle: String =
    """SELECT c_custkey,
      |       lpad(c_mktsegment, 12, '.') AS seg_l,
      |       rpad(c_mktsegment, 12, '.') AS seg_r,
      |       repeat(left(c_name, 2), 3) AS rep2,
      |       reverse(c_name) AS rev_name,
      |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
      |       right(c_name, 4) AS name_tail,
      |       split_part(c_name, '#', 2) AS name_num,
      |       CAST(instr(c_name, '0') AS BIGINT) AS zero_pos,
      |       CAST(starts_with(c_mktsegment, 'BU') AS INT) AS is_bu,
      |       CAST(ends_with(c_mktsegment, 'RY') AS INT) AS is_ry,
      |       CAST(ascii(c_mktsegment) AS BIGINT) AS first_code,
      |       chr(CAST(65 + c_custkey % 26 AS INT)) AS key_chr
      |FROM customer WHERE c_custkey % 37 = 0
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q83

  /** Conditional/null-handling gauntlet: nullif, ifnull, coalesce
    * chains, least/greatest (both engines skip NULLs), nested CASE.
    * Integer outputs only.
    */
  def q83(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v83")(
      """SELECT o_orderkey,
        |       nullif(o_orderpriority, '1-URGENT') AS prio_nz,
        |       ifnull(nullif(o_orderpriority, '1-URGENT'), 'TOP')
        |         AS prio_filled,
        |       CAST(coalesce(nullif(o_custkey % 3, 0),
        |                     nullif(o_custkey % 5, 0), 99) AS BIGINT)
        |         AS first_nz,
        |       CAST(least(o_custkey % 7, nullif(o_custkey % 11, 0),
        |                  o_custkey % 13) AS BIGINT) AS least_mod,
        |       CAST(greatest(o_custkey % 7, nullif(o_custkey % 11, 0),
        |                     o_custkey % 13) AS BIGINT) AS greatest_mod,
        |       CASE WHEN o_orderstatus = 'F' THEN 1
        |            WHEN o_orderstatus = 'O' THEN
        |              CASE WHEN o_custkey % 2 = 0 THEN 2 ELSE 3 END
        |            ELSE 0 END AS status_code
        |FROM orders_v83 WHERE o_orderkey % 50 = 0
        |ORDER BY o_orderkey""".stripMargin)

  val q83Oracle: String =
    """SELECT o_orderkey,
      |       nullif(o_orderpriority, '1-URGENT') AS prio_nz,
      |       ifnull(nullif(o_orderpriority, '1-URGENT'), 'TOP')
      |         AS prio_filled,
      |       CAST(coalesce(nullif(o_custkey % 3, 0),
      |                     nullif(o_custkey % 5, 0), 99) AS BIGINT)
      |         AS first_nz,
      |       CAST(least(o_custkey % 7, nullif(o_custkey % 11, 0),
      |                  o_custkey % 13) AS BIGINT) AS least_mod,
      |       CAST(greatest(o_custkey % 7, nullif(o_custkey % 11, 0),
      |                     o_custkey % 13) AS BIGINT) AS greatest_mod,
      |       CASE WHEN o_orderstatus = 'F' THEN 1
      |            WHEN o_orderstatus = 'O' THEN
      |              CASE WHEN o_custkey % 2 = 0 THEN 2 ELSE 3 END
      |            ELSE 0 END AS status_code
      |FROM orders WHERE o_orderkey % 50 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q84

  /** max_by/min_by (DuckDB: arg_max/arg_min) — "which order was the
    * biggest" without a self-join or window. Ties on raw o_totalprice
    * are possible, so the ordering key is the exact composite
    * cents·2³⁶ + orderkey (cents < 2²⁶ so the product stays ≤ 2⁶²;
    * floor(+0.5) recovers exact cents, see Exact): unique key ⇒ both
    * engines pick the same row deterministically. The 2³⁶ orderkey
    * field (≈ 6.9 × 10¹⁰) covers ~sf10000 key ranges — the round-4
    * 2²⁴ field overflowed on the sf1 headroom corpus's shifted keys,
    * caught by the guard below.
    */
  def q84(spark: SparkSession, dir: String): DataFrame =
    // the composite key is unique only while cents < 2^26 and
    // o_orderkey < 2^36; beyond that orderkey would bleed into the cents
    // field and tie-breaking silently diverges between engines (ADVICE
    // r3) — so out-of-range rows raise instead of mismatching. The guard
    // is Spark-side only: it never fires on valid data (where both
    // engines agree), and on invalid data a loud engine error beats a
    // silent oracle divergence.
    sqlWithViews(spark, dir, "orders" -> "orders_v84")(
      """WITH o AS (
        |  SELECT o_custkey % 100 AS bucket, o_orderkey,
        |         CASE WHEN o_orderkey < 68719476736
        |                   AND o_totalprice * 100 + 0.5 < 67108864
        |              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |                     * 68719476736 + o_orderkey
        |              ELSE CAST(raise_error(concat(
        |                     'q84 composite ordering key overflow: o_orderkey=',
        |                     CAST(o_orderkey AS STRING), ' o_totalprice=',
        |                     CAST(o_totalprice AS STRING))) AS BIGINT)
        |         END AS ord
        |  FROM orders_v84)
        |SELECT bucket,
        |       CAST(max_by(o_orderkey, ord) AS BIGINT) AS biggest_order,
        |       CAST(min_by(o_orderkey, ord) AS BIGINT) AS smallest_order,
        |       count(*) AS n
        |FROM o GROUP BY bucket ORDER BY bucket""".stripMargin)

  val q84Oracle: String =
    """WITH o AS (
      |  SELECT o_custkey % 100 AS bucket, o_orderkey,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 68719476736
      |           + o_orderkey AS ord
      |  FROM orders)
      |SELECT bucket,
      |       CAST(arg_max(o_orderkey, ord) AS BIGINT) AS biggest_order,
      |       CAST(arg_min(o_orderkey, ord) AS BIGINT) AS smallest_order,
      |       count(*) AS n
      |FROM o GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q85

  /** CSV round-trip under the oracle gate: project lossless columns
    * (ints + strings, including '#'-bearing names that need quoting),
    * write with header via the CSV SINK, read back through the CSV
    * SOURCE with an explicit schema, and aggregate. The oracle runs the
    * same aggregate over the original parquet — equality certifies the
    * sink/source pair end-to-end (quoting, header, schema application).
    * Floats are deliberately excluded: CSV prints decimal text, and
    * certifying doubles belongs to parquet (every other query).
    */
  /** Fixed per-process scratch root for the round-trip sinks: a fresh
    * `Files.createTempDirectory` per invocation leaked one /tmp dir per
    * bench/verify run (ADVICE r3). A stable path + overwrite mode reuses
    * the same directory across invocations; runs are single-process, so
    * no concurrency hazard.
    */
  private[queries] def scratchDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  def q85(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("csv_rt")
    table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_mktsegment", StringType),
      StructField("c_nationkey", LongType)))
    spark.read.option("header", "true").schema(schema).csv(out)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("c_custkey")).as("key_sum"),
        sum(length(col("c_name"))).cast("bigint").as("name_chars"),
        countDistinct(col("c_nationkey")).as("n_nations"))
      .orderBy(col("c_mktsegment"))
  }

  val q85Oracle: String =
    """SELECT c_mktsegment, count(*) AS n,
      |       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |       CAST(sum(length(c_name)) AS BIGINT) AS name_chars,
      |       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
      |FROM customer
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q86

  /** JSON-lines round-trip under the oracle gate: same contract as q85
    * through the JSON sink/source, plus a nested struct column to prove
    * structured values survive (props parsed from the events table stay
    * a string here; the struct is built then re-read via the schema).
    */
  def q86(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("json_rt")
    table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        struct(col("event_id").as("id"),
          (col("user_id") % 10).as("shard")).as("meta"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("meta", StructType(Seq(
        StructField("id", LongType),
        StructField("shard", LongType))))))
    spark.read.schema(schema).json(out)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("event_id")).as("id_sum"),
        sum(col("meta.shard")).as("shard_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val q86Oracle: String =
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(event_id) AS BIGINT) AS id_sum,
      |       CAST(sum(user_id % 10) AS BIGINT) AS shard_sum,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q95

  /** ORC round-trip under the oracle gate, with a PARTITIONED sink:
    * project lossless columns of `orders`, write ORC partitioned by
    * o_orderstatus, read the tree back (partition-column recovery from
    * directory names included), and aggregate. The oracle runs the
    * same aggregate over the original parquet — equality certifies the
    * ORC sink/source pair AND the hive-style partition layout end to
    * end. Floats deliberately excluded (q85's CSV rationale).
    *
    * Scale shape: the write is a narrow scan fanned out by partition
    * value (one directory per status — low cardinality, no shuffle
    * added); the read-back prunes nothing here but would prune on any
    * status predicate; the aggregate is partial+final on a 15-key
    * domain.
    */
  def q95(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("orc_rt")
    table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").orc(out)
    spark.read.orc(out)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("key_sum"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val q95Oracle: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
      |FROM orders
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q99

  /** XML round-trip under the oracle gate (Spark 4's built-in XML
    * source): project lossless customer columns — including '#'- and
    * ','-bearing names that exercise element escaping — write with an
    * explicit rowTag, read back with an explicit schema, aggregate by
    * nation. The oracle aggregates the original parquet; equality
    * certifies the XML sink/source pair end to end. Same float
    * exclusion as q85/q95.
    */
  def q99(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("xml_rt")
    table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"))
      .write.mode("overwrite").format("xml")
      .option("rootTag", "customers").option("rowTag", "customer")
      .save(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_mktsegment", StringType),
      StructField("c_nationkey", LongType)))
    spark.read.format("xml").option("rowTag", "customer").schema(schema)
      .load(out)
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("c_custkey")).as("key_sum"),
        sum(length(col("c_name"))).cast("bigint").as("name_chars"),
        countDistinct(col("c_mktsegment")).as("n_segs"))
      .orderBy(col("c_nationkey"))
  }

  val q99Oracle: String =
    """SELECT c_nationkey, count(*) AS n,
      |       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |       CAST(sum(length(c_name)) AS BIGINT) AS name_chars,
      |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segs
      |FROM customer
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_string_gauntlet" -> (q82 _),
    "q83_conditional_gauntlet" -> (q83 _),
    "q84_argmax" -> (q84 _),
    "q85_csv_roundtrip" -> (q85 _),
    "q86_json_roundtrip" -> (q86 _),
    "q95_orc_roundtrip" -> (q95 _),
    "q99_xml_roundtrip" -> (q99 _))

  val oracles: Map[String, String] = Map(
    "q82_string_gauntlet" -> q82Oracle,
    "q83_conditional_gauntlet" -> q83Oracle,
    "q84_argmax" -> q84Oracle,
    "q85_csv_roundtrip" -> q85Oracle,
    "q86_json_roundtrip" -> q86Oracle,
    "q95_orc_roundtrip" -> q95Oracle,
    "q99_xml_roundtrip" -> q99Oracle)
}
