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

final case class ThumbFeatures(
    asset_id: Long,
    width: Int,
    height: Int,
    png_bytes: Long,
    mean_luma: Double,
    decode_error: String)

final case class AudioFeatures(
    asset_id: Long,
    sample_rate: Double,
    n_samples: Long,
    rms: Double,
    peak: Int,
    n_zero_cross: Long,
    decode_error: String)

final case class PhashRow(
    asset_id: Long,
    phash: Long,
    decode_error: String)

final case class ResampledAudio(
    asset_id: Long,
    sample_rate: Double,
    n_samples: Long,
    wav_bytes: Long,
    rms: Double,
    peak: Int,
    decode_error: String)

final case class AudioSpectrum(
    asset_id: Long,
    dom_freq_hz: Long,
    dom_mag2: Long,
    second_freq_hz: Long,
    second_ratio_permille: Long,
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
  * AUDIO DECODE IS ALSO REAL: `javax.sound.sampled.AudioSystem` ships a
  * WAV/PCM codec, so [[decodeAudio]] + [[extractAudioFeatures]] parse
  * actual RIFF containers into waveform features (RMS/peak/zero
  * crossings). Only VIDEO decode remains a STUB ([[decodeStub]]) — no
  * video codec ships in the JDK; the plumbing is identical.
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
  def syntheticImages(spark: SparkSession, n: Int): Dataset[MediaAsset] =
    syntheticImagesSized(spark, n, 16, 12)

  /** As [[syntheticImages]] at an explicit size — q226's DCT hash needs
    * at least the 32×32 downscale grid, which the 16×12 panel can't
    * feed. */
  def syntheticImagesSized(
      spark: SparkSession, n: Int, w: Int, h: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      MediaAsset(
        asset_id = id,
        meta = MediaMeta("image/png", w, h, 0L),
        payload = renderPng(id, w, h))
    }
  }

  /** Seeded 16×12 RGB gradient PNG — pure function of the id. */
  private[graft] def renderPng(seed: Long, w: Int, h: Int): Array[Byte] = {
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

  /** Bounded ImageIO read shared by [[decodeImage]] and [[resizeImage]]:
    * header dimensions are checked BEFORE the pixel buffer is allocated
    * (the MaxDim guard), failures come back as Left (quarantine
    * pattern, never a task failure).
    */
  private def readBounded(payload: Array[Byte])
      : Either[String, java.awt.image.BufferedImage] =
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
      if (img == null) Left("unrecognized image format") else Right(img)
    } catch {
      case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** REAL image decode via the JDK's headless ImageIO. Returns Left with
    * the failure reason for unreadable payloads.
    */
  def decodeImage(payload: Array[Byte]): Either[String, (Int, Int, Double)] =
    readBounded(payload).map { img =>
      (img.getWidth, img.getHeight, lumaOf(img))
    }

  /** Mean BT.601 luma of a decoded image — shared by [[decodeImage]] and
    * [[extractThumbnails]] (which computes features of the resized pixel
    * buffer directly, never round-tripping through its own PNG).
    */
  private def lumaOf(img: java.awt.image.BufferedImage): Double = {
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
    sum / (img.getWidth.toLong * img.getHeight)
  }

  /** REAL image resize: integer box-average downscale by an integer
    * factor k — every target pixel is the floor of the exact integer
    * mean of its k×k source block, per channel. Deliberately NOT
    * Graphics2D/getScaledInstance: their interpolation is driven by
    * implementation-defined rendering hints, while integer block means
    * are bit-identical on every JVM — the same reproducibility contract
    * as the rest of the engine. Trailing rows/columns that don't fill a
    * block are dropped (target dims = floor(w/k) × floor(h/k)); the
    * thumbnail re-encodes as PNG (lossless, so the determinism survives
    * the round-trip). Left on unreadable input, zero target dims, or a
    * non-positive factor.
    */
  def resizeImage(payload: Array[Byte], factor: Int)
      : Either[String, (Int, Int, Array[Byte])] =
    resizeToImage(payload, factor).map { out =>
      (out.getWidth, out.getHeight, encodePng(out))
    }

  /** Box-average downscale to a pixel buffer (shared by [[resizeImage]]
    * and [[extractThumbnails]]). Block sums accumulate in Long: with
    * MaxDim = 16384 the factor can reach 16384, and 255·factor² would
    * overflow Int past factor 2901 — Long holds 255·16384² with room.
    */
  private def resizeToImage(payload: Array[Byte], factor: Int)
      : Either[String, java.awt.image.BufferedImage] =
    if (factor <= 0) Left(s"non-positive resize factor $factor")
    else readBounded(payload).flatMap { img =>
      val (tw, th) = (img.getWidth / factor, img.getHeight / factor)
      if (tw == 0 || th == 0)
        Left(s"factor $factor exceeds image dims ${img.getWidth}x${img.getHeight}")
      else {
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val area = factor.toLong * factor
        var ty = 0
        while (ty < th) {
          var tx = 0
          while (tx < tw) {
            var (rs, gs, bs) = (0L, 0L, 0L)
            var dy = 0
            while (dy < factor) {
              var dx = 0
              while (dx < factor) {
                val rgb = img.getRGB(tx * factor + dx, ty * factor + dy)
                rs += (rgb >> 16) & 0xff
                gs += (rgb >> 8) & 0xff
                bs += rgb & 0xff
                dx += 1
              }
              dy += 1
            }
            out.setRGB(tx, ty,
              (((rs / area) << 16) | ((gs / area) << 8) | (bs / area)).toInt)
            tx += 1
          }
          ty += 1
        }
        Right(out)
      }
    }

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batch thumbnailing: one `mapPartitions` pass — decode, box-average
    * downscale, PNG re-encode, and features of the RESIZED pixels, all
    * executor-side (payloads never visit the driver).
    */
  def extractThumbnails(assets: Dataset[MediaAsset], factor: Int,
      parallelism: Int): Dataset[ThumbFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(parallelism, col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          resizeToImage(a.payload, factor) match {
            case Right(thumb) =>
              // features come from the resized pixel buffer itself — no
              // decode round-trip through the PNG we just encoded, so
              // there is no second failure path to swallow
              val png = encodePng(thumb)
              ThumbFeatures(a.asset_id, thumb.getWidth, thumb.getHeight,
                png.length.toLong, lumaOf(thumb), null)
            case Left(err) =>
              ThumbFeatures(a.asset_id, -1, -1, 0L, 0.0, err)
          }
        }
      }
  }

  /** n×n grid of integer block-mean lumas (BT.601 in integer millis —
    * 299r+587g+114b; block mean = floor of the exact integer sum /
    * block area). Block boundaries are `(g·dim)/n` so EVERY pixel lands
    * in exactly one block (no cropped trailing rows/cols — for a 63×63
    * image an old `dim/n`-sized grid would hash only the top-left
    * quarter), and the arithmetic stays all-integer, so both consumers
    * ([[phash64]], [[dctHash64]]) are bit-identical on every JVM.
    * Returns g(gx)(gy); requires width ≥ n and height ≥ n (every block
    * non-empty).
    */
  private def blockLumaGrid(
      img: java.awt.image.BufferedImage, n: Int): Array[Array[Long]] = {
    val w = img.getWidth
    val h = img.getHeight
    val g = Array.ofDim[Long](n, n)
    var gy = 0
    while (gy < n) {
      val y0 = gy * h / n
      val y1 = (gy + 1) * h / n
      var gx = 0
      while (gx < n) {
        val x0 = gx * w / n
        val x1 = (gx + 1) * w / n
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val gc = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += 299L * r + 587L * gc + 114L * b
            x += 1
          }
          y += 1
        }
        g(gx)(gy) = sum / ((x1 - x0).toLong * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    g
  }

  /** 64-bit perceptual average-hash (aHash — the classic pHash-family
    * baseline: Zauner 2010, "Implementation and Benchmarking of
    * Perceptual Image Hash Functions"): decode, build the 8×8
    * [[blockLumaGrid]] (full-coverage integer block means), set bit i
    * iff block i's mean is STRICTLY above the floor of the 64-block
    * grand mean. All-integer end to end, so the hash is bit-identical
    * on every JVM — the same reproducibility contract as
    * [[resizeImage]], where a float resize + float mean would drift.
    * Left for unreadable payloads or images smaller than the grid.
    */
  def phash64(payload: Array[Byte]): Either[String, Long] =
    readBounded(payload).flatMap { img =>
      if (img.getWidth < 8 || img.getHeight < 8)
        Left(s"too small for the 8x8 grid: ${img.getWidth}x${img.getHeight}")
      else {
        val g = blockLumaGrid(img, 8)
        val means = Array.tabulate(64)(i => g(i % 8)(i / 8))
        val grand = means.sum / 64
        var hash = 0L
        var i = 0
        while (i < 64) {
          if (means(i) > grand) hash |= (1L << i)
          i += 1
        }
        Right(hash)
      }
    }

  /** Fixed-point DCT-II cosine table at scale 2^14. Built with
    * StrictMath (fdlibm semantics, bit-identical on every JVM — the
    * reason this table can feed a cross-run-stable hash where
    * Math.cos's platform-intrinsic freedom could not).
    */
  private val DctScale = 1L << 14
  private lazy val dctCos: Array[Array[Long]] =
    Array.tabulate(32, 32)((u, x) =>
      Math.round(
        StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 64.0) * DctScale))

  /** 64-bit DCT perceptual hash (pHash proper — Zauner 2010 §3.2): the
    * robust member of the q213 family. aHash thresholds block means, so
    * global brightness/contrast shifts flip many bits at once; the DCT
    * hash thresholds the 63 lowest-frequency AC coefficients against
    * their lower median, which is invariant to any monotone global
    * luminance change that preserves coefficient ORDER. Pipeline:
    * integer 32×32 block-mean luma grid (BT.601 millis, the q213
    * discipline), exact 2D DCT-II as two int64 matrix multiplies
    * against the fixed-point [[dctCos]] table (|coef| bounded by
    * 255000·2^14·32² < 2^57 — no overflow), top-left 8×8 block, bit i
    * set iff coefficient i exceeds the lower median of the 63 AC
    * values (DC bit 0 always clear). All-integer end to end: the hash
    * is bit-identical on every JVM and rerun.
    */
  def dctHash64(payload: Array[Byte]): Either[String, Long] =
    readBounded(payload).flatMap { img =>
      if (img.getWidth < 32 || img.getHeight < 32)
        Left(s"too small for the 32x32 grid: ${img.getWidth}x${img.getHeight}")
      else {
        val g = blockLumaGrid(img, 32) // g(x)(y): column x, row y
        // T[u][y] = Σ_x C[u][x]·g[x][y]; F[u][v] = Σ_y T[u][y]·C[v][y]
        val t = Array.ofDim[Long](8, 32)
        var u = 0
        while (u < 8) {
          var y = 0
          while (y < 32) {
            var s = 0L
            var x = 0
            while (x < 32) { s += dctCos(u)(x) * g(x)(y); x += 1 }
            t(u)(y) = s
            y += 1
          }
          u += 1
        }
        val f = Array.ofDim[Long](8, 8)
        u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0L
            var y = 0
            while (y < 32) { s += t(u)(y) * dctCos(v)(y); y += 1 }
            f(u)(v) = s
            v += 1
          }
          u += 1
        }
        val ac = (1 until 64).map(i => f(i / 8)(i % 8)).sorted
        val med = ac(31) // lower median of the 63 AC coefficients
        var hash = 0L
        var i = 1
        while (i < 64) {
          if (f(i / 8)(i % 8) > med) hash |= (1L << i)
          i += 1
        }
        Right(hash)
      }
    }

  /** Batch DCT hashing ([[dctHash64]]). */
  def extractDctHashes(
      assets: Dataset[MediaAsset], parallelism: Int): Dataset[PhashRow] =
    extractHashes(assets, parallelism, dctHash64)

  /** Near-duplicate variant of an image: the lowest blue bit of pixel
    * (0,0) flipped and the result re-encoded — visually identical, a
    * different payload byte stream (the perceptual-dedup test case an
    * exact fingerprint like q29's md5 can never match).
    */
  def perturbPixel(payload: Array[Byte]): Array[Byte] =
    readBounded(payload) match {
      case Right(img) =>
        img.setRGB(0, 0, img.getRGB(0, 0) ^ 1)
        encodePng(img)
      case Left(_) => payload
    }

  /** Batch hashing: one `mapPartitions` pass (the codec rule); failures
    * carry the error string and the 0L sentinel, which consumers must
    * EXCLUDE from Hamming comparisons (two failures would otherwise
    * "match" at distance 0).
    */
  private def extractHashes(
      assets: Dataset[MediaAsset], parallelism: Int,
      hashFn: Array[Byte] => Either[String, Long]): Dataset[PhashRow] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(parallelism, col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          hashFn(a.payload) match {
            case Right(h) => PhashRow(a.asset_id, h, null)
            case Left(err) => PhashRow(a.asset_id, 0L, err)
          }
        }
      }
  }

  /** Batch average-hashing ([[phash64]]). */
  def extractPhashes(
      assets: Dataset[MediaAsset], parallelism: Int): Dataset[PhashRow] =
    extractHashes(assets, parallelism, phash64)

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

  /** Deterministic synthetic WAV assets (REAL RIFF/PCM bytes, written via
    * javax.sound.sampled from a seeded two-tone signal) — the test corpus
    * for the real audio decode path.
    */
  def syntheticAudio(spark: SparkSession, n: Int): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val payload = renderWav(id, 2000, 8000f)
      MediaAsset(
        asset_id = id,
        meta = MediaMeta("audio/wav", 0, 0, 2000L * 1000 / 8000),
        payload = payload)
    }
  }

  /** Seeded mono 16-bit PCM WAV: a two-tone signal whose frequencies are
    * pure functions of the id. StrictMath keeps the samples bit-identical
    * across JVMs/CPUs (Math.sin may use platform intrinsics).
    */
  private[graft] def renderWav(
      seed: Long, nSamples: Int, sampleRate: Float): Array[Byte] = {
    val f1 = 220.0 + (seed % 16) * 55.0
    val f2 = 440.0 + (seed % 7) * 110.0
    val samples = new Array[Int](nSamples)
    var i = 0
    while (i < nSamples) {
      val t = i / sampleRate.toDouble
      val v = 0.6 * StrictMath.sin(2 * StrictMath.PI * f1 * t) +
        0.3 * StrictMath.sin(2 * StrictMath.PI * f2 * t)
      samples(i) =
        math.max(-32768L, math.min(32767L, math.round(v * 20000))).toInt
      i += 1
    }
    encodeWav(samples, sampleRate)
  }

  /** Frame-count ceiling: a crafted RIFF header claiming hours of audio
    * would otherwise make the task buffer unbounded sample data.
    */
  private val MaxFrames = 10000000L

  /** REAL audio decode via the JDK's WAV/PCM codec. Left on unreadable
    * or unsupported payloads (quarantine pattern, never a task failure).
    * Supports the mono/stereo 16-bit PCM the JDK codec emits; the frame
    * count is bounded BEFORE sample data is buffered.
    */
  def decodeAudio(payload: Array[Byte])
      : Either[String, (Double, Long, Double, Int, Long)] =
    readPcm(payload).map { case (rate, samples) =>
      val (rms, peak, zc) = pcmFeatures(samples)
      (rate.toDouble, samples.length.toLong, rms, peak, zc)
    }

  /** Waveform features of a PCM sample array — the single copy of the
    * feature math, shared by [[decodeAudio]] and
    * [[extractResampledAudio]] (the same one-definition rule as
    * [[readPcm]] for the byte-to-sample contract).
    */
  private def pcmFeatures(samples: Array[Int]): (Double, Int, Long) = {
    val n = samples.length
    var sumSq = 0.0
    var peak = 0
    var zc = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val s = samples(i)
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && ((s < 0 && prev >= 0) || (s >= 0 && prev < 0))) zc += 1
      prev = s
      i += 1
    }
    (if (n == 0) 0.0 else math.sqrt(sumSq / n), peak, zc)
  }

  /** Shared bounded PCM reader ([[decodeAudio]] + [[decimateAudio]]):
    * RIFF parse, format/frame-count guards, then the raw sign-extended
    * 16-bit samples — the single copy of the byte-to-sample contract.
    */
  private def readPcm(payload: Array[Byte])
      : Either[String, (Float, Array[Int])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1)
          Left(s"unsupported format: ${fmt.getSampleSizeInBits}-bit " +
            s"${fmt.getChannels}ch")
        else if (ais.getFrameLength > MaxFrames)
          Left(s"declared frame count ${ais.getFrameLength} out of bounds")
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            // the HIGH byte carries the sign: sign-extend it (.toInt),
            // mask only the low byte — per-endianness
            val b0 = bytes(2 * i)
            val b1 = bytes(2 * i + 1)
            samples(i) = if (fmt.isBigEndian) (b0.toInt << 8) | (b1 & 0xff)
                         else (b1.toInt << 8) | (b0 & 0xff)
            i += 1
          }
          Right((fmt.getSampleRate, samples))
        }
      } finally ais.close()
    } catch {
      case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** REAL audio resample: integer-factor DECIMATION — the output keeps
    * every `factor`-th sample verbatim (sample-exact, the audio
    * analogue of [[resizeImage]]'s bit-determinism; a windowed low-pass
    * would introduce float filter kernels that vary with vector ISA).
    * The output rate is rate/factor; re-encoded as mono 16-bit PCM WAV
    * so the result survives a round-trip through the same codec. The
    * factor must DIVIDE the integer sample rate: the RIFF header stores
    * rates as integers, so a fractional rate/factor would silently
    * disagree with the WAV this function's callers write — rejected
    * loudly instead (quarantine pattern).
    */
  def decimateAudio(payload: Array[Byte], factor: Int)
      : Either[String, (Float, Array[Int])] =
    if (factor <= 0) Left(s"non-positive decimation factor $factor")
    else readPcm(payload).flatMap { case (rate, samples) =>
      if (samples.isEmpty || samples.length < factor)
        Left(s"factor $factor exceeds sample count ${samples.length}")
      else if (rate != rate.toInt.toFloat || rate.toInt % factor != 0)
        Left(s"factor $factor does not divide sample rate $rate — " +
          "the integer RIFF header could not represent the result")
      else {
        val out = new Array[Int]((samples.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = samples(i * factor); i += 1 }
        Right((rate / factor, out))
      }
    }

  /** Mono 16-bit PCM WAV encoder (little-endian) — shared by the
    * seeded render and [[extractResampledAudio]].
    */
  private[graft] def encodeWav(samples: Array[Int], rate: Float): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Batch audio resample: one `mapPartitions` pass — decode, decimate,
    * WAV re-encode, and features of the DECIMATED samples, all
    * executor-side. Features come from the decimated sample array
    * itself (no decode round-trip through the WAV just written — the
    * same no-second-failure-path rule as [[extractThumbnails]]).
    */
  def extractResampledAudio(assets: Dataset[MediaAsset], factor: Int,
      parallelism: Int): Dataset[ResampledAudio] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(parallelism, col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          decimateAudio(a.payload, factor) match {
            case Right((rate, samples)) =>
              val wav = encodeWav(samples, rate)
              val (rms, peak, _) = pcmFeatures(samples)
              ResampledAudio(a.asset_id, rate.toDouble, samples.length.toLong,
                wav.length.toLong, rms, peak, null)
            case Left(err) =>
              ResampledAudio(a.asset_id, -1.0, 0L, 0L, 0.0, 0, err)
          }
        }
      }
  }

  /** q258 probe grid: the 55 Hz lattice both synthetic tones live on
    * (f1 = 220 + 55·(id%16), f2 = 440 + 110·(id%7) = 220 + 55·(4+2k)).
    * A production pipeline probes genre/speech bands the same way —
    * fixed bins, never a corpus-dependent FFT length.
    */
  private[graft] val SpectrumBinsHz: Array[Long] =
    Array.tabulate(17)(k => 220L + 55L * k)

  /** Fixed-point trig scale for the exact DFT (2²⁰, the q226 DCT-table
    * discipline). */
  private[graft] val TrigScale = 1L << 20

  /** EXACT single-bin DFT power: Σx·⌊cos·2²⁰⌋ and Σx·⌊sin·2²⁰⌋ folded
    * in int64 (|term| ≤ 32768·2²⁰, ×N samples ≈ 7·10¹² at N=2000 —
    * far inside int64), de-scaled by floorDiv, then squared (≤ ~4·10¹³
    * per component). StrictMath keeps the table bit-identical across
    * JVMs/CPUs — the same determinism contract as [[renderWav]] and
    * the q226 DCT cosine table. THE single copy of the bin-power math
    * (the batch extractor and MultimodalSpec's model both call it).
    */
  private[graft] def dftPowerAt(
      samples: Array[Int], rate: Float, freqHz: Long): Long = {
    val w = 2 * StrictMath.PI * freqHz / rate.toDouble
    var sc = 0L; var ss = 0L
    var n = 0
    while (n < samples.length) {
      val c = StrictMath.floor(StrictMath.cos(w * n) * TrigScale).toLong
      val s = StrictMath.floor(StrictMath.sin(w * n) * TrigScale).toLong
      sc += samples(n) * c
      ss += samples(n) * s
      n += 1
    }
    val a = Math.floorDiv(sc, TrigScale)
    val b = Math.floorDiv(ss, TrigScale)
    a * a + b * b
  }

  /** Batch audio SPECTRUM: one `mapPartitions` pass — real RIFF decode,
    * then the exact fixed-point DFT power at every [[SpectrumBinsHz]]
    * probe (the audio twin of the q226 image DCT: same fixed-point
    * trig-table discipline, executor-side, constant work per asset).
    * Reports the dominant bin, its power, the runner-up bin, and the
    * runner-up/dominant ratio in permille — the two-tone structure of
    * the synthetic corpus makes the expected answer derivable from the
    * asset id alone, which is exactly what the spec pins. Ties break
    * toward the lower frequency.
    */
  def extractAudioSpectrum(assets: Dataset[MediaAsset],
      parallelism: Int): Dataset[AudioSpectrum] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(parallelism, col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          readPcm(a.payload) match {
            case Right((rate, samples)) =>
              val powers = SpectrumBinsHz
                .map(f => (f, dftPowerAt(samples, rate, f)))
              val (domF, domP) = powers.minBy { case (f, p) => (-p, f) }
              val rest = powers.filter(_._1 != domF)
              val (secF, secP) = rest.minBy { case (f, p) => (-p, f) }
              AudioSpectrum(a.asset_id, domF, domP, secF,
                if (domP == 0) 0L else 1000L * secP / domP, null)
            case Left(err) =>
              AudioSpectrum(a.asset_id, -1L, 0L, -1L, 0L, err)
          }
        }
      }
  }

  /** Batch audio decode: one `mapPartitions` pass, real RIFF parsing. */
  def extractAudioFeatures(assets: Dataset[MediaAsset], parallelism: Int): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets
      .repartition(parallelism, col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          decodeAudio(a.payload) match {
            case Right((rate, n, rms, peak, zc)) =>
              AudioFeatures(a.asset_id, rate, n, rms, peak, zc, null)
            case Left(err) =>
              AudioFeatures(a.asset_id, -1.0, 0L, 0.0, 0, 0L, err)
          }
        }
      }
  }

  /** STUB decoder for video — deterministic fake; no video codec ships
    * in the JDK. The image and audio paths above are the real thing.
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
