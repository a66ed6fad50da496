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

final case class ImageFeatures(
    asset_id: Long,
    width: Int,
    height: Int,
    n_pixels: Long,
    mean_luma: Double,
    decode_error: String)

/** Multimodal-column plumbing (SURVEY.md §2.3 E5): schema, partitioning,
  * and batch-shaped decode — the Scala analogue of a Pandas-UDF
  * `mapInPandas` stage: `mapPartitions` over the typed Dataset so each
  * task amortizes decoder setup over its whole partition.
  *
  * IMAGE DECODE IS REAL: the JDK's headless `javax.imageio` decodes
  * PNG/JPEG/GIF/BMP/TIFF, so [[decodeImage]] + [[extractImageFeatures]]
  * run an actual pixel pipeline (dimensions + mean luminance), with
  * corrupt payloads surfaced per-row instead of failing the task.
  * AUDIO/VIDEO decode remains a STUB ([[decodeStub]]) — no such codecs
  * ship in this container; the plumbing is identical.
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

  /** Deterministic synthetic PNG assets (REAL image bytes, rendered via
    * java.awt from a seeded pattern) — the test corpus for the real
    * decode path.
    */
  def syntheticImages(spark: SparkSession, n: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      MediaAsset(
        asset_id = id,
        meta = MediaMeta("image/png", 16, 12, 0L),
        payload = renderPng(id, 16, 12))
    }
  }

  /** Seeded 16×12 RGB gradient PNG — pure function of the id. */
  private[multimodal] def renderPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((seed * 17 + x * 3) % 256).toInt
        val b = ((seed * 11 + y * 5) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Reject images whose declared header dimensions would make
    * `ImageIO.read` allocate unbounded memory (a corrupt/crafted IHDR
    * claiming 60000×60000 would OOM the task before any pixel exists).
    */
  private val MaxDim = 16384

  /** REAL image decode via the JDK's headless ImageIO. Returns Left with
    * the failure reason for unreadable payloads (the quarantine pattern,
    * never a task failure). Header dimensions are checked BEFORE the
    * pixel buffer is allocated.
    */
  def decodeImage(payload: Array[Byte]): Either[String, (Int, Int, Double)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Left("unrecognized image format")
      val reader = readers.next()
      reader.setInput(iis)
      val (hw, hh) = (reader.getWidth(0), reader.getHeight(0))
      if (hw <= 0 || hh <= 0 || hw > MaxDim || hh > MaxDim) {
        reader.dispose()
        return Left(s"declared dimensions ${hw}x${hh} out of bounds")
      }
      val img = try reader.read(0) finally reader.dispose()
      if (img == null) Left("unrecognized image format")
      else {
        var sum = 0.0
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += 0.299 * r + 0.587 * g + 0.114 * b
            x += 1
          }
          y += 1
        }
        val px = img.getWidth.toLong * img.getHeight
        Right((img.getWidth, img.getHeight, sum / px))
      }
    } catch {
      case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** Batch image decode: one `mapPartitions` pass, real pixels. */
  def extractImageFeatures(assets: Dataset[MediaAsset], parallelism: Int): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(parallelism, col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          decodeImage(a.payload) match {
            case Right((w, h, luma)) =>
              ImageFeatures(a.asset_id, w, h, w.toLong * h, luma, null)
            case Left(err) =>
              ImageFeatures(a.asset_id, -1, -1, 0L, 0.0, err)
          }
        }
      }
  }

  /** STUB decoder for audio/video — deterministic fake; no such codecs
    * ship in this container. The image path above is the real thing.
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
