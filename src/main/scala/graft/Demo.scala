package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.grid.GridFixtures
import graft.streaming.Ingest

/** End-to-end demo of the engine's ingest surface, runnable standalone:
  * fixture grids (+ one corrupt file) → streaming AvailableNow ingest
  * with quarantine → partitioned serving table → catalog registration →
  * SQL with partition pruning. Mirrors the reference's full EP1+EP2
  * lifecycle (SURVEY.md §3) in one process.
  *
  * Usage: sbt "runMain graft.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // graft extensions are installed: native functions visible to SQL
    println("[demo] cosine_sim(x, x) = " + spark.sql(
      "SELECT cosine_sim(array(1.0f, 2.0f), array(1.0f, 2.0f))").head.getDouble(0))

    val in = Files.createTempDirectory("demo-in")
    GridFixtures.files.foreach(f => Files.writeString(in.resolve(f.name), f.content))
    Files.writeString(in.resolve("GARBAGE_radiation_20180101_0100.txt"), "not a grid")
    val serving = Files.createTempDirectory("demo-serving").toString
    val chk = Files.createTempDirectory("demo-chk").toString
    val arc = Files.createTempDirectory("demo-arc").toString
    val quar = Files.createTempDirectory("demo-quar").toString

    // SQS-style redrive: the garbage file is re-enqueued each drain and
    // condemned to quarantine only on its 5th failed attempt
    (1 to Ingest.DefaultMaxAttempts).foreach { _ =>
      Ingest.runAvailableNow(spark, in.toString, serving, chk, arc, quar)
    }
    println(s"[demo] serving rows: ${spark.read.parquet(serving).count()}")
    val q = spark.read.json(quar).select("file_name", "attempts").head
    println(s"[demo] quarantined: ${q.getString(0)} after ${q.getLong(1)} attempts")

    val db = Catalog.createDatabase(spark, "bom-demo-db")
    Catalog.createRadiationTable(spark, db, "radiation", serving)
    Catalog.repairTable(spark, db, "radiation")
    val pruned = spark.sql(
      s"SELECT count(*) AS n FROM $db.radiation WHERE year=2018 AND month=1")
    println(s"[demo] 2018-01 rows via catalog: ${pruned.head.getLong(0)}")
    spark.sql(
      s"""SELECT date, radiation_type, longitude, latitude, radiation
         |FROM $db.radiation WHERE year=2018 ORDER BY longitude, latitude
         |LIMIT 5""".stripMargin).show(false)

    // reference-exact CSV serving layout (one object per grid file).
    // Streaming ingest archived the originals, so stage a fresh copy.
    val csvIn = Files.createTempDirectory("demo-csv-in")
    GridFixtures.files.foreach(f => Files.writeString(csvIn.resolve(f.name), f.content))
    val csvServing = Files.createTempDirectory("demo-csv").toString
    graft.grid.CsvSink.write(
      graft.grid.GridReader.pointsPerFile(spark, csvIn.toString), csvServing)
    val csvBack = spark.read.option("header", "true").csv(csvServing)
    println(s"[demo] csv serving rows: ${csvBack.count()} files: " +
      graft.io.FileOps.listPrefix(spark, csvServing).size)

    // real multimodal decode: synthetic PNGs through ImageIO on executors
    val imgs = graft.multimodal.Multimodal.syntheticImages(spark, 16)
    val feats = graft.multimodal.Multimodal.extractImageFeatures(imgs, 4)
    val okRows = feats.filter(_.decode_error == null).collect()
    val meanLuma =
      if (okRows.isEmpty) Double.NaN
      else okRows.map(_.mean_luma).sum / okRows.length
    println(f"[demo] decoded ${okRows.length}/16 PNGs, mean luma $meanLuma%.2f")

    // file state machine bootstrap (O25)
    val stageRoot = Files.createTempDirectory("demo-stages").toString
    println(s"[demo] stages: " +
      graft.io.FileOps.bootstrapStages(spark, stageRoot)
        .map(_.split('/').last).mkString(","))
    spark.stop()
  }
}
