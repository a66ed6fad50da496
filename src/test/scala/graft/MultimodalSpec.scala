package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing: schema, batch decode shape,
  * frame sampling, parquet round-trip of binary + struct metadata.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("assets carry binary payloads with typed struct metadata") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir)
    val schema = assets.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val one = assets.filter(_.asset_id == 0).head()
    assert(one.meta.mime == "image/png" && one.payload.nonEmpty)
  }

  test("extractFeatures runs batch-shaped and is deterministic") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir)
    val feats = Multimodal.extractFeatures(assets, parallelism = 4)
    val n = assets.count()
    assert(feats.count() == n)
    val f0 = feats.filter(_.asset_id == 0).head()
    // stub decode: mean byte of the UTF-8 payload — recompute locally
    val payload = Multimodal.assetsFromDocuments(spark, sfDir)
      .filter(_.asset_id == 0).head().payload
    val (expectedMean, expectedFrames) = Multimodal.decodeStub(payload)
    assert(f0.mean_byte == expectedMean && f0.frames_sampled == expectedFrames)
    assert(f0.n_bytes == payload.length.toLong)
  }

  test("sampleFrames cuts every k-th 64-byte block") {
    val assets = Multimodal.assetsFromDocuments(spark, sfDir).filter(_.asset_id < 5)
    val frames = Multimodal.sampleFrames(assets, everyK = 2)
    assert(frames.columns.toSeq == Seq("asset_id", "frame_no", "frame_bytes"))
    val rows = frames.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) % 2 == 0))
  }

  test("real PNG decode: dimensions and luminance from actual pixels") {
    val assets = Multimodal.syntheticImages(spark, 20)
    val feats = Multimodal.extractImageFeatures(assets, parallelism = 4)
      .collect().sortBy(_.asset_id)
    assert(feats.length == 20)
    assert(feats.forall(f => f.decode_error == null))
    assert(feats.forall(f => f.width == 16 && f.height == 12 && f.n_pixels == 192))
    // cross-check one asset against a local decode of the same bytes
    val bytes = Multimodal.syntheticImages(spark, 20)
      .filter(_.asset_id == 7).head().payload
    val Right((w, h, luma)) = Multimodal.decodeImage(bytes)
    assert((w, h) == ((16, 12)))
    assert(math.abs(feats(7).mean_luma - luma) < 1e-12)
    assert(luma > 0 && luma < 255)
  }

  test("corrupt image payloads surface per-row, not as task failures") {
    import spark.implicits._
    val bad = Seq(
      graft.multimodal.MediaAsset(100L,
        graft.multimodal.MediaMeta("image/png", 0, 0, 0L),
        Array[Byte](1, 2, 3, 4))).toDS()
    val f = Multimodal.extractImageFeatures(bad, 1).head()
    assert(f.decode_error != null && f.width == -1)
  }

  test("metadata-only reads prune the binary payload from the scan") {
    val out = Files.createTempDirectory("mm-prune").toString
    Multimodal.assetsFromDocuments(spark, sfDir).write.mode("overwrite").parquet(out)
    val metaOnly = spark.read.parquet(out)
      .select(org.apache.spark.sql.functions.col("asset_id"),
        org.apache.spark.sql.functions.col("meta.mime"))
    val plan = metaOnly.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("payload"),
      s"payload column must be pruned from a metadata-only scan:\n$plan")
    assert(metaOnly.count() > 0)
  }

  test("binary + struct round-trips through parquet unchanged") {
    val out = Files.createTempDirectory("mm-parquet").toString
    val assets = Multimodal.assetsFromDocuments(spark, sfDir).filter(_.asset_id < 10)
    assets.write.mode("overwrite").parquet(out)
    import spark.implicits._
    val back = spark.read.parquet(out).as[graft.multimodal.MediaAsset]
    val a = assets.collect().sortBy(_.asset_id)
    val b = back.collect().sortBy(_.asset_id)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.meta == y.meta)
      assert(java.util.Arrays.equals(x.payload, y.payload))
    }
  }

  test("real WAV decode: waveform stats from actual RIFF/PCM parsing") {
    val assets = Multimodal.syntheticAudio(spark, 20)
    val feats = Multimodal.extractAudioFeatures(assets, parallelism = 4)
      .collect().sortBy(_.asset_id)
    assert(feats.length == 20)
    assert(feats.forall(_.decode_error == null))
    assert(feats.forall(f => f.sample_rate == 8000.0 && f.n_samples == 2000))
    // a two-tone 0.6/0.3-amplitude signal at 20000 full scale: RMS must
    // land near 20000*sqrt(0.6^2+0.3^2)/sqrt(2) ≈ 9486, peak near 18000
    assert(feats.forall(f => f.rms > 6000 && f.rms < 14000), feats.head)
    assert(feats.forall(f => f.peak > 10000 && f.peak <= 18000))
    assert(feats.forall(f => f.n_zero_cross > 50))
    // cross-check one asset against a local decode of the same bytes
    val bytes = Multimodal.syntheticAudio(spark, 20)
      .filter(_.asset_id == 7).head().payload
    val Right((rate, n, rms, peak, zc)) = Multimodal.decodeAudio(bytes)
    assert(rate == 8000.0 && n == 2000)
    assert(math.abs(feats(7).rms - rms) < 1e-12)
    assert(feats(7).peak == peak && feats(7).n_zero_cross == zc)
  }

  test("decoded samples reproduce the synthesized signal exactly") {
    // render seed 3, decode, and re-synthesize the same two-tone signal
    // locally: every 16-bit sample must match bit-for-bit (StrictMath)
    val payload = Multimodal.renderWav(3L, 500, 8000f)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val bytes = ais.readAllBytes()
    assert(bytes.length == 1000)
    val f1 = 220.0 + (3L % 16) * 55.0
    val f2 = 440.0 + (3L % 7) * 110.0
    var i = 0
    while (i < 500) {
      val t = i / 8000.0
      val v = 0.6 * StrictMath.sin(2 * StrictMath.PI * f1 * t) +
        0.3 * StrictMath.sin(2 * StrictMath.PI * f2 * t)
      val expected =
        math.max(-32768L, math.min(32767L, math.round(v * 20000))).toShort
      val got = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort
      assert(got == expected, s"sample $i: got $got expected $expected")
      i += 1
    }
  }

  test("big-endian audio (AU) decodes with correct sign extension") {
    // two samples: -256 (0xFF00) then +256 — an unsigned-assembly bug
    // reads -256 as +65280 (peak blows past 16-bit range, zero
    // crossings vanish)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val raw = Array[Byte](0xff.toByte, 0x00, 0x01, 0x00) // BE: -256, 256
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AU, bos)
    val Right((rate, n, rms, peak, zc)) = Multimodal.decodeAudio(bos.toByteArray)
    assert(rate == 8000.0 && n == 2)
    assert(peak == 256, s"sign-extension broken: peak=$peak")
    assert(zc == 1, s"zero crossing lost: zc=$zc")
    assert(math.abs(rms - 256.0) < 1e-9)
  }

  test("corrupt audio payloads surface per-row, not as task failures") {
    import spark.implicits._
    val bad = Seq(
      graft.multimodal.MediaAsset(100L,
        graft.multimodal.MediaMeta("audio/wav", 0, 0, 0L),
        Array[Byte](82, 73, 70, 70, 1, 2, 3, 4))).toDS() // truncated RIFF
    val f = Multimodal.extractAudioFeatures(bad, 1).head()
    assert(f.decode_error != null && f.sample_rate == -1.0)
  }

  test("resize: box-average thumbnails are pixel-exact against the render formula") {
    val seed = 7L
    val k = 4
    val png = Multimodal.renderPng(seed, 16, 12)
    val Right((tw, th, thumb)) = Multimodal.resizeImage(png, k)
    assert(tw == 4 && th == 3)
    // decode the thumbnail and check EVERY pixel against the integer
    // block mean of the known render pattern
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(thumb))
    def srcChan(x: Int, y: Int): (Int, Int, Int) = (
      ((seed * 31 + x * 7 + y * 13) % 256).toInt,
      ((seed * 17 + x * 3) % 256).toInt,
      ((seed * 11 + y * 5) % 256).toInt)
    for (ty <- 0 until th; tx <- 0 until tw) {
      var (rs, gs, bs) = (0, 0, 0)
      for (dy <- 0 until k; dx <- 0 until k) {
        val (r, g, b) = srcChan(tx * k + dx, ty * k + dy)
        rs += r; gs += g; bs += b
      }
      val rgb = img.getRGB(tx, ty)
      assert(((rgb >> 16) & 0xff) == rs / (k * k), s"R at ($tx,$ty)")
      assert(((rgb >> 8) & 0xff) == gs / (k * k), s"G at ($tx,$ty)")
      assert((rgb & 0xff) == bs / (k * k), s"B at ($tx,$ty)")
    }
  }

  test("resize: byte-identical reruns, dimension truncation, loud edge failures") {
    val png = Multimodal.renderPng(3L, 15, 10) // 15 % 4 != 0: trailing cols drop
    val Right((tw, th, a)) = Multimodal.resizeImage(png, 4)
    val Right((_, _, b)) = Multimodal.resizeImage(png, 4)
    assert(tw == 3 && th == 2, "target dims = floor(src/k)")
    assert(java.util.Arrays.equals(a, b), "thumbnails are bit-reproducible")
    assert(Multimodal.resizeImage(png, 0).isLeft, "non-positive factor rejected")
    assert(Multimodal.resizeImage(png, 99).isLeft, "factor beyond dims rejected")
    assert(Multimodal.resizeImage(Array[Byte](1, 2, 3), 2).isLeft,
      "corrupt payload quarantined")
  }

  test("resample: integer decimation is sample-exact and loud on bad input") {
    val wav = Multimodal.renderWav(3L, 2000, 8000f)
    // factor 1 is the identity read: all samples, unchanged rate
    val Right((fullRate, full)) = Multimodal.decimateAudio(wav, 1)
    assert(fullRate == 8000f && full.length == 2000)
    val Right((rate, dec)) = Multimodal.decimateAudio(wav, 4)
    assert(rate == 2000f && dec.length == 500)
    // every output sample is the literal factor-th input sample
    (0 until dec.length).foreach(i => assert(dec(i) == full(i * 4)))
    // sample count NOT divisible keeps the ceil count (2000/32 -> 63;
    // the rate 8000/32 = 250 stays integral as the guard requires)
    val Right((rate32, dec32)) = Multimodal.decimateAudio(wav, 32)
    assert(rate32 == 250f && dec32.length == 63 && dec32(62) == full(1984))
    assert(Multimodal.decimateAudio(wav, 0).isLeft, "non-positive rejected")
    assert(Multimodal.decimateAudio(wav, 2001).isLeft,
      "factor beyond sample count rejected")
    assert(Multimodal.decimateAudio(wav, 3).isLeft,
      "factor not dividing the 8000 Hz rate rejected — the integer RIFF " +
        "header could not represent 8000/3")
    assert(Multimodal.decimateAudio(Array[Byte](1, 2, 3), 2).isLeft,
      "garbage payload surfaces as Left")
  }

  test("resample: WAV re-encode round-trips and is byte-reproducible") {
    val wav = Multimodal.renderWav(9L, 2000, 8000f)
    val Right((rate, dec)) = Multimodal.decimateAudio(wav, 4)
    val a = Multimodal.encodeWav(dec, rate)
    val b = Multimodal.encodeWav(dec, rate)
    assert(java.util.Arrays.equals(a, b), "encode is bit-reproducible")
    // the re-encoded WAV decodes back to the very same samples
    val Right((rate2, dec2)) = Multimodal.decimateAudio(a, 1)
    assert(rate2 == 2000f && dec2.sameElements(dec))
  }

  test("q122: resampled features are the decimated samples' features") {
    val out = graft.queries.MultimodalQueries.q122(spark, "unused").collect()
    assert(out.length == 64)
    out.foreach { r =>
      assert(!r.getAs[Boolean]("failed"))
      assert(r.getAs[Double]("sample_rate") == 2000.0)
      assert(r.getAs[Long]("n_samples") == 500L)
      assert(r.getAs[Long]("wav_bytes") > 1000L)
      val rms = r.getAs[Double]("rms")
      assert(rms > 6000 && rms < 14000)
    }
    // cross-check one asset: the reported rms is the rms of the
    // decimated samples, not of the original waveform
    val wav = Multimodal.renderWav(7L, 2000, 8000f)
    val Right((_, dec)) = Multimodal.decimateAudio(wav, 4)
    val expected = math.sqrt(dec.map(s => s.toDouble * s).sum / dec.length)
    val reported = out(7).getAs[Double]("rms")
    assert(math.abs(reported - BigDecimal(expected)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q112: thumbnail features are the resized pixels' features") {
    val out = graft.queries.MultimodalQueries.q112(spark, "unused").collect()
    assert(out.length == 64)
    out.foreach { r =>
      assert(!r.getAs[Boolean]("failed"))
      assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 3,
        "16x12 synthetic images downscale 4x to 4x3")
      assert(r.getAs[Long]("png_bytes") > 0)
      val luma = r.getAs[Double]("mean_luma")
      assert(luma > 0 && luma < 255)
    }
  }

  test("phash64 equals a first-principles block-mean hash, pixel for pixel") {
    // independent recompute: decode the payload with ImageIO directly,
    // derive the 8x8 full-coverage integer block means (boundary
    // formula (g*dim)/8 — every pixel in exactly one block) and the
    // threshold bits
    val payload = Multimodal.renderPng(7L, 16, 12)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth, img.getHeight)
    val means = (0 until 64).map { i =>
      val (gx, gy) = (i % 8, i / 8)
      val (x0, x1) = (gx * w / 8, (gx + 1) * w / 8)
      val (y0, y1) = (gy * h / 8, (gy + 1) * h / 8)
      var sum = 0L
      for (y <- y0 until y1; x <- x0 until x1) {
        val rgb = img.getRGB(x, y)
        sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
      }
      sum / ((x1 - x0).toLong * (y1 - y0))
    }
    val grand = means.sum / 64
    val expected = means.zipWithIndex.foldLeft(0L) { case (h, (m, i)) =>
      if (m > grand) h | (1L << i) else h
    }
    assert(Multimodal.phash64(payload) == Right(expected))
    // deterministic across calls
    assert(Multimodal.phash64(payload) == Multimodal.phash64(payload))
    // too-small images fail loudly, not wrongly
    assert(Multimodal.phash64(Multimodal.renderPng(1L, 4, 4)).isLeft)
  }

  test("q213: perturbed copies are perceptual near-dups; exact fingerprints disagree") {
    val base = Multimodal.renderPng(3L, 16, 12)
    val dup = Multimodal.perturbPixel(base)
    assert(!java.util.Arrays.equals(base, dup),
      "the perturbed payload must differ byte-wise (md5 would miss it)")
    val Right(h1) = Multimodal.phash64(base)
    val Right(h2) = Multimodal.phash64(dup)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 1,
      "a one-bit pixel change moves at most one block past its threshold")

    val out = graft.queries.MultimodalQueries.q213(spark, "unused").collect()
    assert(out.length == 80, "64 originals + 16 perturbed copies")
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(byId.values.forall(!_._3), "every payload decodes")
    // every perturbed copy finds its original (and vice versa)
    (0L until 64L by 4).foreach { id =>
      assert(byId(id + 100)._2 >= 1L, s"copy of $id must match something")
      assert(byId(id)._2 >= 1L, s"original $id must be matched back")
      assert(java.lang.Long.bitCount(byId(id)._1 ^ byId(id + 100)._1) <=
        graft.queries.MultimodalQueries.PhashMaxHamming)
    }
    // determinism: a rerun is value-identical
    val again = graft.queries.MultimodalQueries.q213(spark, "unused").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(again == byId)
  }

  test("dctHash64 equals a first-principles integer DCT, coefficient for coefficient") {
    // independent recompute with its own StrictMath table and loop
    // order — on NON-multiple-of-32 dimensions, so the full-coverage
    // boundary formula is what's being pinned, not just the easy case
    val payload = Multimodal.renderPng(9L, 63, 50)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth, img.getHeight)
    def mean(gx: Int, gy: Int): Long = {
      val (x0, x1) = (gx * w / 32, (gx + 1) * w / 32)
      val (y0, y1) = (gy * h / 32, (gy + 1) * h / 32)
      var sum = 0L
      for (y <- y0 until y1; x <- x0 until x1) {
        val rgb = img.getRGB(x, y)
        sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
      }
      sum / ((x1 - x0).toLong * (y1 - y0))
    }
    def c(u: Int, x: Int): Long =
      Math.round(StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 64.0) * 16384L)
    def coef(u: Int, v: Int): Long =
      (0 until 32).map(x => (0 until 32).map(y =>
        c(u, x) * mean(x, y) * c(v, y)).sum).sum
    val f = (0 until 64).map(i => coef(i / 8, i % 8))
    val med = f.tail.sorted.apply(31)
    val expected = (1 until 64).foldLeft(0L)((h, i) =>
      if (f(i) > med) h | (1L << i) else h)
    assert(Multimodal.dctHash64(payload) == Right(expected))
    assert((expected & 1L) == 0L, "the DC bit is always clear")
    // too-small images fail loudly, not wrongly
    assert(Multimodal.dctHash64(Multimodal.renderPng(1L, 16, 12)).isLeft)
  }

  test("q226: DCT near-dups match perturbed copies; hashes discriminate originals") {
    val base = Multimodal.renderPng(5L, 64, 64)
    val dup = Multimodal.perturbPixel(base)
    val Right(h1) = Multimodal.dctHash64(base)
    val Right(h2) = Multimodal.dctHash64(dup)
    assert(java.lang.Long.bitCount(h1 ^ h2) <=
      graft.queries.MultimodalQueries.DctMaxHamming,
      "a one-bit pixel change must stay inside the near-dup radius")

    val out = graft.queries.MultimodalQueries.q226(spark, "unused").collect()
    assert(out.length == 60, "48 originals + 12 perturbed copies")
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(byId.values.forall(!_._3), "every payload decodes")
    (0L until 48L by 4).foreach { id =>
      assert(byId(id + 100)._2 >= 1L, s"copy of $id must match something")
      assert(byId(id)._2 >= 1L, s"original $id must be matched back")
    }
    // the hash must discriminate: distinct originals produce many
    // distinct hashes (a degenerate all-equal hash would also 'match')
    val origHashes = (0L until 48L).map(byId(_)._1).distinct
    assert(origHashes.size >= 24, s"only ${origHashes.size} distinct hashes")
    // determinism: a rerun is value-identical
    val again = graft.queries.MultimodalQueries.q226(spark, "unused").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(again == byId)
  }
}
