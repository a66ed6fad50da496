package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog surface (reference O20-O22, SURVEY.md §2.1): the Athena DDL
  * the reference issues through `start_query_execution`
  * (`bom-create-database/bom_create_database.py:41`,
  * `bom-partition/bom_partition.py:77,126`) maps onto Spark's built-in
  * catalog commands, synchronous in-session instead of fire-and-forget.
  *
  * The reference's MSCK-once marker protocol
  * (`bom-partition/bom_partition.py:29-49`) is subsumed by running MSCK
  * idempotently; incremental single-partition registration stays
  * available for the per-file path.
  *
  * Every method takes an optional [[DdlLedger]] — the analogue of the
  * reference's Athena query-log OutputLocation
  * (`bom-partition/bom_partition.py:71-74,120-123`): pass one and each
  * statement lands an execution record (statement, SUCCEEDED/FAILED,
  * error, timing) in the ledger directory; the default Noop keeps the
  * plain synchronous behavior.
  */
object Catalog {

  /** `CREATE DATABASE IF NOT EXISTS`, with the reference's `-`→`_` name
    * sanitization (`bom-create-database/bom_create_database.py:27`).
    */
  def createDatabase(
      spark: SparkSession,
      name: String,
      ledger: DdlLedger = DdlLedger.Noop): String = {
    val db = sanitize(name)
    run(spark, s"CREATE DATABASE IF NOT EXISTS $db", ledger)
    db
  }

  def sanitize(name: String): String =
    name.replaceAll("[^A-Za-z0-9_]", "_")

  /** Register the radiation serving table over an existing partitioned
    * parquet layout. The table DDL is explicit (the reference never
    * committed its own, SURVEY.md §1.3).
    */
  def createRadiationTable(
      spark: SparkSession,
      db: String,
      table: String,
      location: String,
      ledger: DdlLedger = DdlLedger.Noop): Unit =
    run(spark,
      s"""CREATE TABLE IF NOT EXISTS $db.$table
         |  (date STRING, radiation_type STRING,
         |   longitude DOUBLE, latitude DOUBLE, radiation INT,
         |   year INT, month INT, day INT, hour INT)
         |USING PARQUET
         |PARTITIONED BY (year, month, day, hour)
         |LOCATION '$location'""".stripMargin,
      ledger)

  /** O21: discover all partitions after a bulk load. */
  def repairTable(
      spark: SparkSession,
      db: String,
      table: String,
      ledger: DdlLedger = DdlLedger.Noop): Unit =
    run(spark, s"MSCK REPAIR TABLE $db.$table", ledger)

  /** O22: incremental single-partition registration (the per-file path,
    * `bom-partition/bom_partition.py:126`, on the unified
    * year/month/day/hour granularity per SURVEY.md §1.4.6).
    */
  def addPartition(
      spark: SparkSession,
      db: String,
      table: String,
      year: Int, month: Int, day: Int, hour: Int,
      ledger: DdlLedger = DdlLedger.Noop): Unit =
    run(spark,
      s"""ALTER TABLE $db.$table ADD IF NOT EXISTS
         |PARTITION (year=$year, month=$month, day=$day, hour=$hour)"""
        .stripMargin,
      ledger)

  def query(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)

  /** Single DDL funnel: every catalog statement executes here, so a
    * ledger observes ALL of them or none.
    */
  private def run(
      spark: SparkSession, sql: String, ledger: DdlLedger): Unit =
    ledger.record(sql) { spark.sql(sql) }
}
