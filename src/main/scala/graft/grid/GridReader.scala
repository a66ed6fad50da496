package graft.grid

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One output row of the radiation ETL (serving-table schema, FIXTURES.md
  * F4). `date` is the Sydney-local rendering `yyyy-MM-dd HH:mm` (constant
  * per file, `bom/bom.py:68,148`); `year/month/day/hour` are the
  * Sydney-local partition keys (`bom/bom.py:28-32`, standardized to ints
  * per SURVEY.md §1.5).
  */
final case class RadiationPoint(
    date: String,
    radiation_type: String,
    longitude: Double,
    latitude: Double,
    radiation: Int,
    year: Int,
    month: Int,
    day: Int,
    hour: Int)

/** Batch ingest layer: directory of ESRI ASCII grids → typed
  * `Dataset[RadiationPoint]` → Hive-partitioned parquet.
  *
  * Files are read whole (`wholetext`) because the 6 header lines are
  * positional (SURVEY.md §7.4): the unit of parallelism is the FILE,
  * matching the reference's 1-file-1-lambda fan-out
  * (`cloudformation/lambda.cfn.yaml:127`). BOM grids are ≈886×691 ints —
  * far below executor memory — so per-file flatMap is safe at any corpus
  * size; 100 TB of grids parallelizes across files, not within them.
  */
object GridReader {

  /** Explode every grid file under `inDir` into typed points. */
  def readGrids(spark: SparkSession, inDir: String): Dataset[RadiationPoint] = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .text(inDir)
      .select(input_file_name().as("file_name"), col("value"))
      .as[(String, String)]
      .flatMap { case (name, text) => explodeFile(name, text) }
  }

  /** Batch ingest with the streaming path's fault tolerance: corrupt
    * files are returned separately instead of failing the job (batch
    * analogue of the quarantine sink). Returns (points, badFiles) where
    * badFiles carries (file_name, error).
    */
  def readGridsSafe(
      spark: SparkSession,
      inDir: String): (Dataset[RadiationPoint], Dataset[(String, String)]) = {
    import spark.implicits._
    val parsed = spark.read
      .option("wholetext", "true")
      .text(inDir)
      .select(input_file_name().as("file_name"), col("value"))
      .as[(String, String)]
      .map { case (name, text) =>
        scala.util.Try(explodeFile(name, text).toSeq) match {
          case scala.util.Success(pts) => (name, pts, null: String)
          case scala.util.Failure(e) =>
            (name, Seq.empty[RadiationPoint],
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
      .cache() // both returned branches filter this — avoid a double parse
    (parsed.filter(_._3 == null).flatMap(_._2),
      parsed.filter(_._3 != null).map(t => (t._1, t._3)))
  }

  /** Byte-exact O1 semantics: the reference decodes with
    * `decode('utf-8', 'ignore')` (`bom/bom.py:58`) — undecodable bytes are
    * silently DROPPED, not replaced. Spark's text source substitutes
    * U+FFFD instead, so this path reads raw bytes (`binaryFile` source)
    * and applies a java.nio CharsetDecoder with IGNORE actions.
    */
  def readGridsLossy(spark: SparkSession, inDir: String): Dataset[RadiationPoint] = {
    import spark.implicits._
    spark.read
      .format("binaryFile")
      .load(inDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        explodeFile(name, decodeLossy(bytes))
      }
  }

  /** Python `bytes.decode('utf-8', 'ignore')` equivalent. */
  def decodeLossy(bytes: Array[Byte]): String = {
    import java.nio.charset.{CodingErrorAction, StandardCharsets}
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** Group exploded points per source file — feed for [[CsvSink]]'s
    * one-object-per-file layout.
    */
  def pointsPerFile(spark: SparkSession, inDir: String): Dataset[(String, Seq[RadiationPoint])] = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .text(inDir)
      .select(input_file_name().as("file_name"), col("value"))
      .as[(String, String)]
      .map { case (name, text) =>
        (AscGrid.parseFileName(name).baseName, explodeFile(name, text).toSeq)
      }
  }

  /** Pure per-file transform — shared by the batch and streaming paths
    * and directly unit-testable.
    */
  def explodeFile(fileName: String, wholeText: String): Iterator[RadiationPoint] = {
    val meta = AscGrid.parseFileName(fileName)
    AscGrid.parse(wholeText).explode.map { p =>
      RadiationPoint(
        date = meta.localDateTime,
        radiation_type = meta.radiationType,
        longitude = p.longitude,
        latitude = p.latitude,
        radiation = p.radiation,
        year = meta.year,
        month = meta.month,
        day = meta.day,
        hour = meta.hour)
    }
  }

  /** Write the serving table: Hive layout `year=/month=/day=/hour=`
    * (`bom/bom.py:28-32`) in parquet (not CSV — SURVEY.md §1.5 fixes the
    * reference's header-row-as-data defect by construction). Partition
    * discovery + pruning then come free on read.
    */
  def writePartitioned(
      points: Dataset[RadiationPoint],
      servingDir: String,
      mode: SaveMode = SaveMode.Append): Unit =
    points.write
      .mode(mode)
      .partitionBy("year", "month", "day", "hour")
      .parquet(servingDir)

  /** OPT-IN reference-layout sink: the same Hive tree but with the
    * reference's zero-padded STRING partition values
    * (`year=2020/month=01/day=05/hour=09` — `bom/bom.py:28-32` builds
    * keys from strftime, so Athena sees strings). [[writePartitioned]]
    * stays the default (int partitions, SURVEY.md §1.2); this mode
    * exists for users serving INTO an existing Athena layout, where a
    * byte-for-byte path diff against the reference tree must come up
    * empty. Reading the tree back with Spark re-infers ints unless
    * `spark.sql.sources.partitionColumnTypeInference.enabled=false` —
    * set it when byte-parity matters on the read side too.
    */
  def writePartitionedRefLayout(
      points: Dataset[RadiationPoint],
      servingDir: String,
      mode: SaveMode = SaveMode.Append): Unit =
    points.toDF()
      .withColumn("year", format_string("%04d", col("year")))
      .withColumn("month", format_string("%02d", col("month")))
      .withColumn("day", format_string("%02d", col("day")))
      .withColumn("hour", format_string("%02d", col("hour")))
      .write
      .mode(mode)
      .partitionBy("year", "month", "day", "hour")
      .parquet(servingDir)
}
