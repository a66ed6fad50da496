package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media payload. The payload itself stays
  * an uninterpreted `binary` column end-to-end (parquet BYTE_ARRAY), so
  * 100 TB of media shuffles/stores without decode cost; only the narrow
  * metadata struct participates in filters and joins.
  */
final case class MediaMeta(
    mime: String,
    width: Int,
    height: Int,
    durationMs: Long)

final case class MediaAsset(
    asset_id: Long,
    meta: MediaMeta,
    payload: Array[Byte])

final case class DecodedFeatures(
    asset_id: Long,
    mime: String,
    n_bytes: Long,
    mean_byte: Double,
    frames_sampled: Int)

/** Multimodal-column plumbing (SURVEY.md §2.3 E5): schema, partitioning,
  * and batch-shaped decode — the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: `mapPartitions` over the typed Dataset so each
  * task amortizes decoder setup over its whole partition.
  *
  * DECODE IS A STUB: no image/audio codecs ship in this container, so
  * [[decodeStub]] derives deterministic fake pixel statistics from the
  * payload bytes. The Spark-side contract — binary column schema,
  * per-partition batching, feature extraction signature, parquet
  * round-trip — is real and tested; swapping the stub for a JNI/FFM
  * decoder changes no plumbing.
  */
object Multimodal {

  /** Deterministic synthetic assets derived from the documents table:
    * the text bytes act as the payload, metadata is derived from its
    * length — stable across engines and runs.
    */
  def assetsFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val payload = text.getBytes("UTF-8")
        MediaAsset(
          asset_id = id,
          meta = MediaMeta(
            mime = if (id % 2 == 0) "image/png" else "audio/wav",
            width = (nChars % 640).toInt,
            height = (nChars % 480).toInt,
            durationMs = nChars * 10),
          payload = payload)
      }
  }

  /** STUB decoder — deterministic fake. A real implementation would hand
    * `payload` to an image/audio codec; none exists in this container.
    */
  def decodeStub(payload: Array[Byte]): (Double, Int) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val meanByte = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
    val framesSampled = payload.length / 64 + 1 // every-64-bytes "frame"
    (meanByte, framesSampled)
  }

  /** Batch decode: repartition for even decoder load, then one
    * `mapPartitions` pass — decoder state (here none; in real life the
    * codec context) initializes once per task, not once per row.
    */
  def extractFeatures(assets: Dataset[MediaAsset], parallelism: Int): Dataset[DecodedFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(parallelism, col("asset_id"))
      .mapPartitions { it =>
        // per-task decoder init would go here
        it.map { a =>
          val (meanByte, frames) = decodeStub(a.payload)
          DecodedFeatures(
            asset_id = a.asset_id,
            mime = a.meta.mime,
            n_bytes = a.payload.length.toLong,
            mean_byte = meanByte,
            frames_sampled = frames)
        }
      }
  }

  /** Frame sampling shape: every k-th 64-byte block of the payload as a
    * (asset_id, frame_no, frame_bytes) table — the explode pattern a
    * video pipeline uses, with the payload cut driver-free on executors.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets
      .flatMap { a =>
        a.payload.grouped(64).zipWithIndex.collect {
          case (block, i) if i % everyK == 0 => (a.asset_id, i, block)
        }
      }
      .toDF("asset_id", "frame_no", "frame_bytes")
  }
}
