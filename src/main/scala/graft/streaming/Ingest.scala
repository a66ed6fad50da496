package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.grid.{GridReader, RadiationPoint}

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
  *
  * Failure handling mirrors the reference's SQS redrive policy
  * (`cloudformation/lambda.cfn.yaml:40-45`, `maxReceiveCount: 5`): a
  * failing file is RE-ENQUEUED up to `maxAttempts - 1` times before it
  * is condemned to the quarantine sink, so transient failures (a flaky
  * downstream, a half-written object) self-heal while poison files
  * still land in the DLQ with their full attempt history. The attempt
  * counter rides the re-enqueued file's NAME (`retry<k>__<original>`),
  * exactly as SQS rides the receive count on message metadata — no
  * side ledger, and the streaming checkpoint sees each attempt as a
  * fresh path.
  */
object Ingest {

  /** Default redrive budget — the reference's `maxReceiveCount: 5`. */
  val DefaultMaxAttempts = 5

  private val RetryName = "retry(\\d+)__(.+)".r

  /** attempt number + logical (original) base name from a path. */
  private[streaming] def attemptOf(path: String): (Int, String) = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    base match {
      case RetryName(k, orig) => (k.toInt, orig)
      case _ => (1, base)
    }
  }

  /** Drain `inDir` once: parse every new grid file, append good points to
    * the partitioned serving table; a failing file is re-enqueued for the
    * next drain until it has failed `maxAttempts` times, then appended to
    * the quarantine dir (path + error + attempts as JSON). Returns after
    * the drain.
    *
    * `parse` is injectable for fault-injection tests; production callers
    * use the default grid parser.
    */
  def runAvailableNow(
      spark: SparkSession,
      inDir: String,
      servingDir: String,
      checkpointDir: String,
      archiveDir: String,
      quarantineDir: String,
      maxAttempts: Int = DefaultMaxAttempts,
      parse: (String, String) => Seq[RadiationPoint] =
        (name, text) => GridReader.explodeFile(name, text).toSeq): StreamingQuery = {
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
        processBatch(batch, servingDir, quarantineDir, inDir, maxAttempts, parse)
      }
      .start()
    query.awaitTermination()
    query
  }

  /** The ALWAYS-ON posture of the same pipeline: identical source,
    * routing, redrive, and checkpoint as [[runAvailableNow]], but on a
    * `ProcessingTime` trigger with `maxFilesPerTrigger` back-pressure —
    * the long-running equivalent of the reference's push-driven
    * S3-event → Lambda choreography (each micro-batch is one "event
    * delivery"). Returns the RUNNING query; the caller owns its
    * lifecycle (`stop()`), and a restart from the same checkpoint
    * resumes exactly where the stream left off (the soak case in
    * IngestSpec proves no file is lost or duplicated across a
    * stop/restart, and that the result equals one AvailableNow drain).
    *
    * Delivery contract: offsets commit AFTER `foreachBatch` returns, so
    * the sink sees each file at-least-once across a HARD mid-batch
    * kill; between micro-batches (and across graceful stop/restart) the
    * checkpoint makes processing exactly-once. The reference has the
    * identical window (bom/bom.py processes, then deletes the SQS
    * message), so parity is by design, not accident.
    */
  def runProcessingTime(
      spark: SparkSession,
      inDir: String,
      servingDir: String,
      checkpointDir: String,
      archiveDir: String,
      quarantineDir: String,
      maxAttempts: Int = DefaultMaxAttempts,
      intervalMs: Long = 500L,
      maxFilesPerTrigger: Int = 4,
      parse: (String, String) => Seq[RadiationPoint] =
        (name, text) => GridReader.explodeFile(name, text).toSeq): StreamingQuery = {
    val raw = spark.readStream
      .option("wholetext", "true")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(inDir)
      .select(input_file_name().as("file_name"), col("value"))
    raw.writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, servingDir, quarantineDir, inDir, maxAttempts, parse)
      }
      .start()
  }

  /** Per-batch routing: good files → serving table; failed files →
    * re-enqueue (attempt < maxAttempts) or quarantine (attempt ==
    * maxAttempts). File TEXT never rides to the driver: retry files are
    * written EXECUTOR-SIDE (a poisoned batch of large corrupt files
    * stays distributed — the driver sees only names and error strings),
    * and the quarantine record is a distributed JSON append. inDir is
    * executor-visible by construction — the file source's read tasks
    * already run there.
    */
  private[streaming] def processBatch(
      batch: DataFrame,
      servingDir: String,
      quarantineDir: String,
      inDir: String,
      maxAttempts: Int,
      parse: (String, String) => Seq[RadiationPoint]): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val parsed = batch.as[(String, String)].map { case (name, text) =>
      val (attempt, logical) = attemptOf(name)
      // parse under the ORIGINAL name so filename-metadata extraction is
      // attempt-invariant
      Try(parse(logical, text)) match {
        case Success(pts) => (logical, attempt, pts, null: String, null: String)
        case Failure(e) =>
          (logical, attempt, Seq.empty[RadiationPoint],
            s"${e.getClass.getSimpleName}: ${e.getMessage}", text)
      }
    }.cache()
    try {
      val good = parsed.filter(_._4 == null).flatMap(_._3)
      GridReader.writePartitioned(good, servingDir)
      parsed.filter(r => r._4 != null && r._2 < maxAttempts)
        .foreachPartition {
          (it: Iterator[(String, Int, Seq[RadiationPoint], String, String)]) =>
            it.foreach { case (logical, attempt, _, _, text) =>
              reenqueue(inDir, s"retry${attempt + 1}__$logical", text)
            }
        }
      val exhausted = parsed.filter(r => r._4 != null && r._2 >= maxAttempts)
      if (!exhausted.isEmpty) {
        exhausted
          .map { case (logical, attempt, _, err, _) => (logical, err, attempt.toLong) }
          .toDF("file_name", "error", "attempts")
          .write.mode(SaveMode.Append).json(quarantineDir)
      }
    } finally parsed.unpersist()
  }

  /** Atomically materialize a re-enqueued retry file in `inDir`.
    *
    * The always-on [[runProcessingTime]] source lists `inDir` every
    * ~500 ms; a plain create+write can be LISTED half-written, and with
    * `wholetext` the torn prefix either parses as silently truncated
    * data or fails and is re-enqueued with the truncated text as the
    * new payload — permanently corrupting the retry chain. So: write to
    * a `.`-prefixed sibling in the same directory (Spark's file sources
    * filter hidden paths, so the temp can never be listed) and rename
    * it in with ATOMIC_MOVE — same-directory rename is atomic on POSIX
    * filesystems and HDFS. An object-store `inDir` (S3A "rename" is
    * copy+delete, NOT atomic) needs a staging-prefix pattern instead:
    * stage the bytes under a hidden prefix and commit by a single
    * PUT-if-absent of the final key.
    */
  private[graft] def reenqueue(
      inDir: String, name: String, text: String): Unit = {
    val tmp = Paths.get(inDir,
      s".retrytmp_${java.util.UUID.randomUUID().toString.take(8)}_$name")
    Files.write(tmp, text.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(inDir, name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
