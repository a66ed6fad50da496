package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q29: multimodal-column plumbing (SURVEY.md §2.3 E5) — opaque binary
  * payloads plus typed metadata, oracle-checked at the byte level
  * (UTF-8 encode → octet length → md5 fingerprint). The richer typed
  * pipeline (struct metadata, batch decode stubs, frame sampling) lives
  * in `graft.multimodal` with engine tests; this query pins the part
  * both engines can verify: binary round-trip determinism.
  */
object MultimodalQueries {

  def q29(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(
        col("doc_id"),
        lit("text/plain").as("mime"),
        expr("octet_length(encode(text, 'UTF-8'))").cast("long")
          .as("byte_len"),
        md5(col("text")).as("payload_md5"))
      .orderBy(col("doc_id"))

  val q29Oracle: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       md5(text) AS payload_md5
      |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin

  /** q48: the REAL image pipeline as a declared query — 64 seeded PNGs
    * rendered and decoded on executors (javax.imageio), per-asset pixel
    * features. Declared oracle-free: DuckDB has no image codec, so the
    * driver records the rows-only check; determinism is guaranteed by the
    * seeded render (and pinned by ScalaTest's pixel-level cross-check).
    */
  def q48(spark: SparkSession, dir: String): DataFrame = {
    val assets = graft.multimodal.Multimodal.syntheticImages(spark, 64)
    graft.multimodal.Multimodal.extractImageFeatures(assets, 8)
      .toDF()
      .select(col("asset_id"), col("width"), col("height"),
        col("n_pixels"), round(col("mean_luma"), 4).as("mean_luma"),
        col("decode_error").isNotNull.as("failed"))
      .orderBy(col("asset_id"))
  }

  /** q69: the REAL audio pipeline as a declared query — 64 seeded WAVs
    * written and decoded on executors (javax.sound.sampled's RIFF/PCM
    * codec), per-asset waveform features. Declared oracle-free: DuckDB
    * has no audio codec, so the driver records the rows-only check;
    * determinism is guaranteed by the StrictMath-seeded render (and
    * pinned by ScalaTest's sample-level cross-check).
    */
  def q69(spark: SparkSession, dir: String): DataFrame = {
    val assets = graft.multimodal.Multimodal.syntheticAudio(spark, 64)
    graft.multimodal.Multimodal.extractAudioFeatures(assets, 8)
      .toDF()
      .select(col("asset_id"), col("sample_rate"), col("n_samples"),
        round(col("rms"), 4).as("rms"), col("peak"), col("n_zero_cross"),
        col("decode_error").isNotNull.as("failed"))
      .orderBy(col("asset_id"))
  }

  /** q112: the REAL image RESIZE pipeline as a declared query — the 64
    * seeded PNGs of q48, box-average downscaled 4× on executors
    * (integer block means — bit-deterministic, unlike Graphics2D
    * interpolation), PNG re-encoded, and the features of the RESIZED
    * pixels reported. Declared oracle-free like q48 (DuckDB has no
    * image codec; the driver records the rows-only check); pixel-exact
    * block means and byte-identical reruns are pinned in MultimodalSpec.
    */
  def q112(spark: SparkSession, dir: String): DataFrame = {
    val assets = graft.multimodal.Multimodal.syntheticImages(spark, 64)
    graft.multimodal.Multimodal.extractThumbnails(assets, 4, 8)
      .toDF()
      .select(col("asset_id"), col("width"), col("height"),
        col("png_bytes"), round(col("mean_luma"), 4).as("mean_luma"),
        col("decode_error").isNotNull.as("failed"))
      .orderBy(col("asset_id"))
  }

  /** q122: the REAL audio RESAMPLE pipeline as a declared query — the 64
    * seeded WAVs of q69, integer-factor decimated 4× on executors (every
    * 4th sample kept verbatim — sample-exact, the audio analogue of
    * q112's box-average determinism), WAV re-encoded, and the features of
    * the DECIMATED samples reported. Declared oracle-free like q69
    * (DuckDB has no audio codec; the driver records the rows-only check);
    * sample-exact decimation and byte-identical reruns are pinned in
    * MultimodalSpec.
    */
  def q122(spark: SparkSession, dir: String): DataFrame = {
    val assets = graft.multimodal.Multimodal.syntheticAudio(spark, 64)
    graft.multimodal.Multimodal.extractResampledAudio(assets, 4, 8)
      .toDF()
      .select(col("asset_id"), col("sample_rate"), col("n_samples"),
        col("wav_bytes"), round(col("rms"), 4).as("rms"), col("peak"),
        col("decode_error").isNotNull.as("failed"))
      .orderBy(col("asset_id"))
  }

  /** Hamming radius for q213's perceptual near-dup verdict. */
  val PhashMaxHamming = 6

  /** q213: PERCEPTUAL image dedup — the multimodal answer to q17/q21:
    * an exact payload fingerprint (q29's md5) misses a re-encoded or
    * trivially-retouched copy, while the 64-bit average-hash
    * ([[graft.multimodal.Multimodal.phash64]], integer-exact aHash)
    * lands within a small Hamming radius of the original. Corpus: the
    * 64 seeded PNGs plus 16 single-pixel-perturbed near-duplicates
    * (different BYTES, same picture). Per asset: the phash and how
    * many OTHER assets sit within Hamming ≤ [[PhashMaxHamming]]
    * (`bit_count(xor)` — codegen'd). Declared oracle-free by the codec
    * policy (DuckDB has no image decoder); determinism and the
    * near-dup verdicts are pinned in MultimodalSpec.
    *
    * Scale shape: hashing is one executor-side `mapPartitions` pass
    * (payloads never visit the driver); the pair pass here is a tiny
    * broadcast self-join over the 80-asset panel — at corpus scale the
    * 64-bit hash BANDS into prefix buckets exactly like SimHash q42
    * (same key structure, same hot-bucket cap), which is why the hash,
    * not the pairing, is the operator.
    */
  def q213(spark: SparkSession, dir: String): DataFrame =
    perceptualPanel(
      graft.multimodal.Multimodal
        .extractPhashes(panelWithDups(spark,
          graft.multimodal.Multimodal.syntheticImages(spark, 64)), 8)
        .toDF()
        .select(col("asset_id"), col("phash"),
          col("decode_error").isNotNull.as("failed")),
      "phash", PhashMaxHamming)

  /** Every 4th asset duplicated as a single-pixel-perturbed copy at
    * id+100 — the shared q213/q226 panel construction. */
  private def panelWithDups(
      spark: SparkSession,
      base: org.apache.spark.sql.Dataset[graft.multimodal.MediaAsset])
      : org.apache.spark.sql.Dataset[graft.multimodal.MediaAsset] = {
    import spark.implicits._
    base.unionByName(
      base.filter(col("asset_id") % 4 === 0).map { a =>
        a.copy(asset_id = a.asset_id + 100,
          payload = graft.multimodal.Multimodal.perturbPixel(a.payload))
      })
  }

  /** Shared perceptual-dedup panel shape: checkpoint the hash frame
    * once (three consumers — both self-join sides and the final left
    * join — would otherwise re-decode the panel three times), pair by
    * Hamming radius EXCLUDING failed decodes on BOTH sides (the 0L
    * failure sentinel would otherwise "match" other failures at
    * distance 0), and report per-asset near counts. `hashed` must be
    * (asset_id, <hashCol>, failed).
    */
  private def perceptualPanel(
      hashed: DataFrame, hashCol: String, maxHamming: Int): DataFrame = {
    val hashes = hashed.localCheckpoint()
    val near = hashes
      .filter(!col("failed"))
      .join(broadcast(hashes.toDF("b_id", "b_hash", "b_failed")
          .filter(!col("b_failed"))),
        col("b_id") =!= col("asset_id") &&
          expr(s"bit_count($hashCol ^ b_hash) <= $maxHamming"))
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n_near"))
    hashes
      .join(near, Seq("asset_id"), "left")
      .select(col("asset_id"), col(hashCol),
        coalesce(col("n_near"), lit(0L)).as("n_near"), col("failed"))
      .orderBy(col("asset_id"))
  }

  // ---------------------------------------------------------------- q226

  /** Hamming radius for q226's DCT near-dup verdict. */
  val DctMaxHamming = 6

  /** q226: DCT perceptual dedup — pHash PROPER
    * ([[graft.multimodal.Multimodal.dctHash64]]), the robust member of
    * the q213 family: aHash thresholds block means, so a global
    * brightness shift flips many bits at once, while the DCT hash
    * thresholds low-frequency coefficients against their own median —
    * invariant to any order-preserving global luminance change. Corpus:
    * 48 seeded 64×64 PNGs (the DCT needs the 32×32 grid the 16×12
    * panel can't feed) plus 12 single-pixel-perturbed near-duplicates.
    * Same output contract as q213 (hash, near count within Hamming ≤
    * [[DctMaxHamming]], failure flag); declared oracle-free by the
    * codec policy, model-exact + robustness pinned in MultimodalSpec.
    *
    * Scale shape: identical to q213 — hashing is one executor-side
    * `mapPartitions` pass, the panel pair join is a broadcast, and at
    * corpus scale the 64-bit hash bands into prefix buckets like
    * SimHash q42. The DCT itself is two 8×32 · 32×32 integer matrix
    * multiplies per image — constant work per asset, all in int64.
    */
  def q226(spark: SparkSession, dir: String): DataFrame =
    perceptualPanel(
      graft.multimodal.Multimodal
        .extractDctHashes(panelWithDups(spark,
          graft.multimodal.Multimodal
            .syntheticImagesSized(spark, 48, 64, 64)), 8)
        .toDF()
        .select(col("asset_id"), col("phash").as("dct_hash"),
          col("decode_error").isNotNull.as("failed")),
      "dct_hash", DctMaxHamming)

  // ---------------------------------------------------------------- q258

  /** q258: the REAL audio SPECTRUM pipeline as a declared query — the
    * 64 seeded WAVs of q69, decoded on executors and probed with the
    * exact fixed-point DFT at the 55 Hz lattice both synthetic tones
    * live on ([[graft.multimodal.Multimodal.dftPowerAt]] — the audio
    * twin of q226's integer DCT: same StrictMath fixed-point trig
    * discipline, constant work per asset). Per asset: dominant bin,
    * its power, the runner-up, and their permille ratio — with the
    * corpus's two-tone construction (0.6·f1 + 0.3·f2) the expected
    * dominant IS f1 and the runner-up IS f2, which MultimodalSpec pins
    * per asset. Declared oracle-free by the codec policy (DuckDB has
    * no audio codec); the driver records the rows-only check.
    *
    * Scale shape: one executor-side `mapPartitions` pass, N·17
    * multiply-adds per asset — linear in corpus bytes, no shuffle
    * before the final sort.
    */
  def q258(spark: SparkSession, dir: String): DataFrame = {
    val assets = graft.multimodal.Multimodal.syntheticAudio(spark, 64)
    graft.multimodal.Multimodal.extractAudioSpectrum(assets, 8)
      .toDF()
      .select(col("asset_id"), col("dom_freq_hz"), col("dom_mag2"),
        col("second_freq_hz"), col("second_ratio_permille"),
        col("decode_error").isNotNull.as("failed"))
      .orderBy(col("asset_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_binary" -> (q29 _),
    "q48_image_features" -> (q48 _),
    "q69_audio_features" -> (q69 _),
    "q112_image_resize" -> (q112 _),
    "q122_audio_resample" -> (q122 _),
    "q213_image_phash" -> (q213 _),
    "q226_image_dct_hash" -> (q226 _),
    "q258_audio_spectrum" -> (q258 _))

  val oracles: Map[String, String] = Map(
    "q29_multimodal_binary" -> q29Oracle)
}
