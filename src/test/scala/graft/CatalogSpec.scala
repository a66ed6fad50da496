package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.grid.{GridFixtures, GridReader}

/** Catalog DDL surface (O20-O22): database bootstrap, table-over-layout,
  * MSCK partition discovery, incremental ADD PARTITION.
  */
class CatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("createDatabase sanitizes names like the reference") {
    assert(Catalog.sanitize("bom-test-stack-db") == "bom_test_stack_db")
    val db = Catalog.createDatabase(spark, "bom-graft-db")
    assert(spark.catalog.databaseExists(db))
  }

  test("table over partitioned layout + MSCK discovers all partitions") {
    val in = Files.createTempDirectory("cat-in")
    GridFixtures.files.foreach(f => Files.writeString(in.resolve(f.name), f.content))
    val serving = Files.createTempDirectory("cat-serving").toString
    GridReader.writePartitioned(GridReader.readGrids(spark, in.toString), serving)

    val db = Catalog.createDatabase(spark, "bom-graft-db")
    Catalog.createRadiationTable(spark, db, "radiation", serving)
    Catalog.repairTable(spark, db, "radiation")

    val n = spark.sql(s"SELECT count(*) FROM $db.radiation").head.getLong(0)
    assert(n == 14)
    // partition pruning through the catalog
    val pruned = spark.sql(
      s"SELECT count(*) FROM $db.radiation WHERE year=2018 AND month=1")
    assert(pruned.head.getLong(0) == 8)
    val parts = spark.sql(s"SHOW PARTITIONS $db.radiation").count()
    assert(parts == 4) // one per fixture file
  }

  test("ADD PARTITION registers incrementally and is idempotent") {
    val db = Catalog.createDatabase(spark, "bom-graft-db")
    Catalog.addPartition(spark, db, "radiation", 2030, 1, 2, 3)
    Catalog.addPartition(spark, db, "radiation", 2030, 1, 2, 3)
    val parts = spark.sql(s"SHOW PARTITIONS $db.radiation").count()
    assert(parts == 5)
  }

  test("DDL ledger records every statement with terminal status, and failures rethrow") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("ddl-ledger").toString
    val ledger = DdlLedger(spark, dir)
    // two successes + one failure (table does not exist) — the failure
    // must BOTH land in the ledger and still surface to the caller
    val db = Catalog.createDatabase(spark, "bom-ledger-db", ledger)
    Catalog.createDatabase(spark, "bom-ledger-db", ledger) // idempotent rerun
    intercept[Exception] {
      Catalog.addPartition(spark, db, "no_such_table", 2030, 1, 2, 3, ledger)
    }
    val rows = DdlLedger.read(spark, dir)
      .orderBy(col("seq")).collect()
    assert(rows.length == 3)
    assert(rows.take(2).forall(_.getAs[String]("status") == "SUCCEEDED"))
    val failed = rows(2)
    assert(failed.getAs[String]("status") == "FAILED")
    assert(failed.getAs[String]("statement").contains("no_such_table"))
    assert(failed.getAs[String]("error") != null)
    assert(rows.forall(r => r.getAs[String]("statement").nonEmpty))
    // statements are the exact DDL text the catalog ran
    assert(rows.head.getAs[String]("statement")
      == "CREATE DATABASE IF NOT EXISTS bom_ledger_db")
    // an empty ledger reads as an empty frame, not a schema error
    val empty = Files.createTempDirectory("ddl-empty").toString
    assert(DdlLedger.read(spark, empty).isEmpty)
  }
}
