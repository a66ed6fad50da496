package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** q258 audio spectrum: the exact fixed-point DFT must match an
  * independent decode + fold, and the physics must come out right — the
  * dominant bin IS the louder tone f1 and the runner-up IS f2 for every
  * asset (the two-tone corpus makes the expected answer a pure function
  * of the id).
  */
class AudioSpectrumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Independent PCM decode (javax.sound directly, not readPcm). */
  private def decode(payload: Array[Byte]): (Float, Array[Int]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val out = Array.tabulate(n) { i =>
      (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
    }
    ais.close()
    (fmt.getSampleRate, out)
  }

  /** Independent fixed-point DFT power (same contract, own fold). */
  private def power(samples: Array[Int], rate: Float, f: Long): Long = {
    val w = 2 * StrictMath.PI * f / rate.toDouble
    var sc = 0L; var ss = 0L
    for (n <- samples.indices) {
      sc += samples(n) *
        StrictMath.floor(StrictMath.cos(w * n) * (1L << 20)).toLong
      ss += samples(n) *
        StrictMath.floor(StrictMath.sin(w * n) * (1L << 20)).toLong
    }
    val a = Math.floorDiv(sc, 1L << 20)
    val b = Math.floorDiv(ss, 1L << 20)
    a * a + b * b
  }

  test("q258: per-asset dominant/runner-up bins match an independent " +
    "model AND the id-derived two-tone structure") {
    val got = graft.queries.MultimodalQueries
      .q258(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.length == 64 && got.forall(!_._6), "decode failures")
    val payloads = (0 until 64)
      .map(id => (id.toLong, Multimodal.renderWav(id.toLong, 2000, 8000f)))
    val byId = got.map(g => (g._1, g)).toMap
    payloads.foreach { case (id, wav) =>
      val (rate, samples) = decode(wav)
      val powers = Multimodal.SpectrumBinsHz
        .map(f => (f, power(samples, rate, f)))
      val (domF, domP) = powers.minBy { case (f, p) => (-p, f) }
      val (secF, secP) = powers.filter(_._1 != domF)
        .minBy { case (f, p) => (-p, f) }
      val g = byId(id)
      assert((g._2, g._3, g._4, g._5) ==
        ((domF, domP, secF, 1000L * secP / domP)),
        s"asset $id: query ${g} vs model ($domF, $domP, $secF)")
      // physics: the louder tone wins, the quieter tone is runner-up
      val f1 = 220L + 55L * (id % 16)
      val f2 = 440L + 110L * (id % 7)
      assert(domF == f1, s"asset $id: dominant $domF != f1 $f1")
      if (f2 != f1)
        assert(secF == f2, s"asset $id: runner-up $secF != f2 $f2")
      // amplitude ratio 0.3/0.6 -> power ratio ~250 permille
      if (f2 != f1)
        assert(g._5 > 150 && g._5 < 400,
          s"asset $id: ratio ${g._5} outside the two-tone envelope")
    }
  }
}
