package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MonitoringOps

/** First-principles re-derivations of the round-10 pack #13 (q256-q257):
  * the rank-sum U recomputed by BRUTE-FORCE pairwise comparison (the
  * histogram walk under test never runs here), the tie-corrected z from
  * raw moments, and the TVD from independently built histograms.
  */
class SourceTriageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private val Stops = Set("the", "a", "of", "and", "in")

  private def qualU3(text: String): Long = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val nTok = toks.length.toLong
    val stops = toks.count(Stops.contains).toLong
    val alpha = text.count(c => c >= 'a' && c <= 'z').toLong
    400 * math.min(nTok, 50) / 50 + 300 * (nTok - stops) / nTok +
      300 * alpha / text.length
  }

  private lazy val docs: Array[(String, Long)] = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("source", "text").collect()
    .map(r => (r.getString(0), qualU3(r.getString(1))))

  // ------------------------------------------------------------- q256

  test("q256: doubled U matches brute-force pairwise counting and the " +
    "tie-corrected z matches raw moments") {
    val n = docs.length.toLong
    val tieGroups = docs.groupBy(_._2).values.map(_.length.toLong)
    val t3 = tieGroups.map(t => t * t * t - t).sum
    val expect = docs.map(_._1).distinct.sorted.map { src =>
      val mine = docs.filter(_._1 == src).map(_._2)
      val rest = docs.filter(_._1 != src).map(_._2)
      var u2 = 0L
      for (a <- mine; b <- rest)
        u2 += (if (a > b) 2L else if (a == b) 1L else 0L)
      val n1 = mine.length.toDouble; val n2 = rest.length.toDouble
      val varU = (n1 * n2 / 12) *
        ((n.toDouble + 1) - t3.toDouble / (n.toDouble * (n - 1)))
      val z = (u2.toDouble - n1 * n2) / (2 * math.sqrt(varU))
      (src, mine.length.toLong, rest.length.toLong, u2,
        BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        math.abs(z) > MonitoringOps.RankZCrit)
    }.toSeq
    val got = MonitoringOps.q256(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    // compare z loosely (the engine rounds its own bit pattern); the
    // integer columns and the verdict must be exact
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._6)) ==
      expect.map(t => (t._1, t._2, t._3, t._4, t._6)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._5 - e._5) < 1e-5, s"z mismatch: $g vs $e")
    }
  }

  // ------------------------------------------------------------- q257

  test("q257: per-source TVD matches independent histograms and is a " +
    "valid distance (0..1000)") {
    val n = docs.length.toLong
    val glob = docs.groupBy(_._2).map { case (q, xs) =>
      (q, xs.length.toLong) }
    val expect = docs.map(_._1).distinct.sorted.map { src =>
      val mine = docs.filter(_._1 == src)
      val ns = mine.length.toLong
      val h = mine.groupBy(_._2).map { case (q, xs) =>
        (q, xs.length.toLong) }
      val num = glob.map { case (q, g) =>
        math.abs(h.getOrElse(q, 0L) * n - g * ns)
      }.sum
      (src, ns, 1000 * num / (2 * ns * n))
    }.toSeq
    val got = MonitoringOps.q257(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    got.foreach { case (src, _, tvd) =>
      assert(tvd >= 0 && tvd <= 1000, s"$src TVD out of range: $tvd")
    }
  }
}
