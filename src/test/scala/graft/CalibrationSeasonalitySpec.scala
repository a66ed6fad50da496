package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MonitoringOps

/** First-principles re-derivations of the round-10 pack #7 (q240-q242):
  * an independent margin-binned reliability model, a sort-based
  * Hazen-percentile selection model, and a spine-aligned Pearson ACF
  * model, each from collected raw rows.
  */
class CalibrationSeasonalitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q240

  private val specMarkers = Seq(
    "en" -> Set("the", "a", "of", "and", "is"),
    "de" -> Set("der", "die", "das", "und", "ist"),
    "es" -> Set("el", "los", "las", "es", "y"),
    "fr" -> Set("le", "la", "les", "et", "est"),
    "zh" -> Set("的", "是", "了", "在", "和"))

  /** Independent classifier + margin model (same published lexicons,
    * same CASE-chain tie order as the query). */
  private def predictWithMargin(text: String): (String, Long) = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val scores = specMarkers.map { case (l, ms) =>
      l -> toks.count(ms.contains).toLong
    }
    val pred = scores.find { case (_, s) =>
      s > 0 && scores.forall(_._2 <= s)
    }.map(_._1).getOrElse("und")
    val sorted = scores.map(_._2).sorted(Ordering[Long].reverse)
    (pred, sorted(0) - sorted(1))
  }

  test("q240: reliability bins match an independent margin model") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.map { case (lang, text) =>
      val (pred, margin) = predictWithMargin(text)
      (math.min(margin, MonitoringOps.ReliabilityBinMax), lang == pred)
    }.groupBy(_._1).map { case (bin, xs) =>
      val n = xs.length.toLong
      val ok = xs.count(_._2).toLong
      (bin, n, ok, 1000 * ok / n)
    }.toSeq.sortBy(_._1)
    val got = MonitoringOps.q240(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
    assert(got.map(_._2).sum == docs.length.toLong)
  }

  // ------------------------------------------------------------- q241

  test("q241: selections match a sort-based Hazen-percentile model, and the " +
    "percentile rule's per-lang take is threshold-consistent") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def quality(t: String): Long = {
      val toks = t.split(" ").filter(_.nonEmpty)
      val nTok = toks.length.toLong
      val stops = Set("the", "a", "of", "and", "in")
      val stopT = toks.count(stops.contains).toLong
      val alpha = t.count(c => c >= 'a' && c <= 'z').toLong
      400 * math.min(nTok, 50) / 50 + 300 * (nTok - stopT) / nTok +
        300 * alpha / t.length
    }
    val expect = docs.groupBy(_._1).map { case (lang, xs) =>
      val qs = xs.map(t => quality(t._2))
      val n = qs.length.toLong
      val byVal = qs.groupBy(identity).map { case (q, g) =>
        q -> g.size.toLong
      }
      val sortedQ = byVal.keys.toSeq.sorted
      val below = sortedQ.scanLeft(0L)((acc, q) => acc + byVal(q))
      val pct = sortedQ.zip(below).map { case (q, b) =>
        q -> (500 * (2 * b + byVal(q) + 1)) / n
      }.toMap
      val rawSel = qs.count(_ >= MonitoringOps.RawSelThresh).toLong
      val normSel = qs.count(q => pct(q) >= MonitoringOps.NormSelPct).toLong
      val both = qs.count(q => q >= MonitoringOps.RawSelThresh &&
        pct(q) >= MonitoringOps.NormSelPct).toLong
      val cut = qs.filter(q => pct(q) >= MonitoringOps.NormSelPct)
        .reduceOption(_ min _)
      (lang, n, rawSel, normSel, both, cut)
    }.toSeq.sortBy(_._1)
    val got = MonitoringOps.q241(spark, sfDir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toSeq
    assert(got == expect)
    // threshold consistency: everything at or above the effective raw
    // cut is selected — the percentile rule is a pure q_u3 threshold
    got.foreach { case (lang, _, _, normSel, _, cutOpt) =>
      cutOpt.foreach { cut =>
        val atLeast = docs.filter(_._1 == lang)
          .count(t => quality(t._2) >= cut).toLong
        assert(atLeast == normSel, s"$lang: cut=$cut not a clean threshold")
      }
    }
  }

  // ------------------------------------------------------------- q242

  test("q242: daily/weekly ACF matches a spine-aligned Pearson model") {
    val hours = Tables.table(spark, sfDir, "events")
      .select("ts").collect()
      .map { r =>
        val t = r.getTimestamp(0).toInstant
        val micros = t.getEpochSecond * 1000000L + t.getNano / 1000L
        Math.floorDiv(micros, 3600000000L)
      }
    val byHour = hours.groupBy(identity).map { case (h, g) =>
      h -> g.length.toLong
    }
    val h0 = hours.min; val h1 = hours.max
    val spine = (h0 to h1).map(h => byHour.getOrElse(h, 0L))
    val expect = MonitoringOps.AcfLags.map { lag =>
      val l = lag.toInt
      val pairs = spine.indices.dropRight(l).map(i => (spine(i), spine(i + l)))
      val n = pairs.length.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val num = n.toDouble * sxy - sx.toDouble * sy
      val den = math.sqrt(math.max(n.toDouble * sxx - sx.toDouble * sx, 0)) *
        math.sqrt(math.max(n.toDouble * syy - sy.toDouble * sy, 0))
      val r = if (den == 0) None
      else Some(BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (lag, n, sxy, r)
    }
    val got = MonitoringOps.q242(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    assert(got == expect)
    got.flatMap(_._4).foreach(r => assert(r >= -1.0 && r <= 1.0))
  }
}
