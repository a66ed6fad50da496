package graft.streaming

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.grid.GridReader

/** Event-driven ingest (reference EP1, SURVEY.md §3): the S3
  * `ObjectCreated` → Lambda choreography becomes a Structured Streaming
  * file source. The reference's `in/ → processing/ → done/` state machine
  * (`bom/bom.py:50-80`) collapses into the streaming checkpoint
  * (exactly-once file tracking = `processing/`) plus `cleanSource=archive`
  * (`done/`); its `# TODO move to a failed bucket` (`bom/bom.py:84`)
  * becomes a real quarantine sink.
  *
  * `Trigger.AvailableNow` serves the reference's ad-hoc load model
  * ("loads ad-hoc when we get new Data", README.md:6): each run drains
  * whatever arrived, then stops — restartable any time thanks to the
  * checkpoint. At scale the same query runs continuously with
  * `maxFilesPerTrigger` back-pressure.
  */
object Ingest {

  /** Drain `inDir` once: parse every new grid file, append good points to
    * the partitioned serving table, append unparseable files to the
    * quarantine dir (path + error as JSON). Returns after the drain.
    */
  def runAvailableNow(
      spark: SparkSession,
      inDir: String,
      servingDir: String,
      checkpointDir: String,
      archiveDir: String,
      quarantineDir: String): StreamingQuery = {
    val raw = spark.readStream
      .option("wholetext", "true")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .text(inDir)
      .select(input_file_name().as("file_name"), col("value"))

    val query = raw.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, servingDir, quarantineDir)
      }
      .start()
    query.awaitTermination()
    query
  }

  /** Per-batch routing: good files → serving table, bad files →
    * quarantine (the DLQ analogue, `cloudformation/lambda.cfn.yaml:40-45`).
    * The batch is tiny metadata (name + text); parse errors never kill
    * the query.
    */
  private[streaming] def processBatch(
      batch: DataFrame,
      servingDir: String,
      quarantineDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val parsed = batch.as[(String, String)].map { case (name, text) =>
      Try(GridReader.explodeFile(name, text).toSeq) match {
        case Success(pts) => (name, pts, null: String)
        case Failure(e) => (name, Seq.empty, s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }.cache()
    try {
      val good = parsed.filter(_._3 == null).flatMap(_._2)
      GridReader.writePartitioned(good, servingDir)
      val bad = parsed.filter(_._3 != null)
        .map { case (name, _, err) => (name, err) }
        .toDF("file_name", "error")
      if (!bad.isEmpty) {
        bad.write.mode(SaveMode.Append).json(quarantineDir)
      }
    } finally parsed.unpersist()
  }
}
