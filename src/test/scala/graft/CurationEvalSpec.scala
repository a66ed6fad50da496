package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EvalOps

/** First-principles re-derivations of the round-10 pack #4 (q228-q232):
  * every model here recomputes the query's contract from collected raw
  * rows with independent Scala arithmetic — no Spark expression reuse —
  * plus the q229 permutation properties (bijectivity, invertibility)
  * that the hash gate cannot see.
  */
class CurationEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q229

  /** Independent model of the 3-round modular-add Feistel. */
  private def feistel(id: Long): Long = {
    var l = id / EvalOps.FM20
    var h = id % EvalOps.FM20
    for (r <- 1 to EvalOps.FeistelRounds) {
      val f = (h * EvalOps.FMult +
        r * EvalOps.FAddR + EvalOps.FAddC) % EvalOps.FM20
      val nl = h
      val nh = (l + f) % EvalOps.FM20
      l = nl; h = nh
    }
    l * EvalOps.FM20 + h
  }

  /** Exact inverse: runs the rounds backwards. */
  private def feistelInv(pos: Long): Long = {
    var l = pos / EvalOps.FM20
    var h = pos % EvalOps.FM20
    for (r <- EvalOps.FeistelRounds to 1 by -1) {
      val prevH = l
      val f = (prevH * EvalOps.FMult +
        r * EvalOps.FAddR + EvalOps.FAddC) % EvalOps.FM20
      val prevL = ((h - f) % EvalOps.FM20 +
        EvalOps.FM20) % EvalOps.FM20
      l = prevL; h = prevH
    }
    l * EvalOps.FM20 + h
  }

  test("q229: the Feistel map is invertible (hence injective) over a 100k-id slab") {
    val ids = (0L until 100000L)
    val pos = ids.map(feistel)
    assert(pos.toSet.size == 100000, "collision => not a permutation")
    ids.foreach(id => assert(feistelInv(feistel(id)) == id))
    // positions leave the input slab: the map actually scrambles
    assert(pos.count(_ < 100000L) < 1000, "positions barely moved")
  }

  test("q229: query output == the model's top-100 on the real corpus") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, lang) => (feistel(id), id, lang) }
      .sortBy(_._1).take(EvalOps.TrainOrderTop).toSeq
    val got = EvalOps.q229(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expect)
  }

  // ------------------------------------------------------------- q228

  test("q228: per-label leak counts == a quantized squared-L2 model over collected vectors") {
    val rows = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map { r =>
        (r.getLong(0), r.getAs[Number]("label").longValue(),
          r.getSeq[Float](2).map(e =>
            math.floor(e.toDouble * 10000).toLong).toArray)
      }
      .filter(_._3.length == 64)
    val isPanel = (id: Long) => id % 17 == 0 && id < 1700
    val panel = rows.filter(r => isPanel(r._1)).map(_._3)
    assert(panel.nonEmpty && panel.length <= 100)
    val minD2 = rows.filterNot(r => isPanel(r._1)).map { case (_, label, qv) =>
      val d2 = panel.map { pv =>
        var s = 0L
        var i = 0
        while (i < 64) { val d = qv(i) - pv(i); s += d * d; i += 1 }
        s
      }.min
      (label, d2)
    }
    val expect = minD2.groupBy(_._1).map { case (label, xs) =>
      val n = xs.length.toLong
      val leaked = xs.count(_._2 <= EvalOps.SemLeakD2Max).toLong
      (label, n, leaked, 1000 * leaked / n, xs.map(_._2).min)
    }.toSeq.sortBy(_._1)
    val got = EvalOps.q228(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    // the threshold is ACTIVE at this SF in BOTH directions: some
    // vectors flagged AND some clean — an always-clean (or always-
    // leaked) constant would pass the hash gate, not this
    assert(got.map(_._3).sum > 0, "no vector flagged: threshold inert")
    assert(got.map(_._2).sum > got.map(_._3).sum, "every vector flagged")
  }

  // ------------------------------------------------------------- q230

  test("q230: sxy and rho match a sort-based midrank Spearman model") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1)
    val expect = byLang.map { case (lang, xs) =>
      val x = xs.map(t => t._2.split(" ").count(_.nonEmpty).toLong)
      val y = xs.map { t =>
        val alpha = t._2.count(c => c >= 'a' && c <= 'z').toLong
        1000L * alpha / t._2.length
      }
      // doubled midranks via sorting (the classic definition)
      def m2(v: Seq[Long]): Seq[Long] = {
        val grouped = v.groupBy(identity).map { case (k, g) =>
          k -> g.size.toLong
        }
        val sortedK = grouped.keys.toSeq.sorted
        val below = sortedK.scanLeft(0L)((acc, k) => acc + grouped(k))
        val m = sortedK.zip(below).map { case (k, b) =>
          k -> (2 * b + grouped(k) + 1)
        }.toMap
        v.map(m)
      }
      val ax = m2(x); val ay = m2(y)
      val n = x.length.toLong
      val sx = ax.sum; val sy = ay.sum
      val sxx = ax.map(a => a * a).sum
      val syy = ay.map(a => a * a).sum
      val sxy = ax.zip(ay).map { case (a, b) => a * b }.sum
      val num = n.toDouble * sxy - sx.toDouble * sy
      val den = math.sqrt(math.max(n.toDouble * sxx - sx.toDouble * sx, 0)) *
        math.sqrt(math.max(n.toDouble * syy - sy.toDouble * sy, 0))
      val rho = if (den == 0) None
      else Some(BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (lang, n, sxy, rho)
    }.toSeq.sortBy(_._1)
    val got = EvalOps.q230(spark, sfDir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    assert(got == expect)
  }

  // ------------------------------------------------------------- q231

  /** Independent marker-langid model (same published lexicons). */
  private val specMarkers = Seq(
    "en" -> Set("the", "a", "of", "and", "is"),
    "de" -> Set("der", "die", "das", "und", "ist"),
    "es" -> Set("el", "los", "las", "es", "y"),
    "fr" -> Set("le", "la", "les", "et", "est"),
    "zh" -> Set("的", "是", "了", "在", "和"))

  private def predictLang(text: String): String = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val scores = specMarkers.map { case (l, ms) =>
      l -> toks.count(ms.contains).toLong
    }
    // first lang in marker order that ties-or-beats every other and
    // scored at all — the query's CASE-chain order semantics
    scores.find { case (_, s) =>
      s > 0 && scores.forall(_._2 <= s)
    }.map(_._1).getOrElse("und")
  }

  test("q231: kappa matches a confusion-matrix model built from an independent classifier") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), predictLang(r.getString(1))))
    val n = docs.length.toLong
    val agree = docs.count { case (l, p) => l == p }.toLong
    val rowT = docs.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    val colT = docs.groupBy(_._2).map { case (k, g) => k -> g.size.toLong }
    val peNum = rowT.map { case (k, rt) =>
      rt * colT.getOrElse(k, 0L)
    }.sum
    val row = EvalOps.q231(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == agree)
    assert(row.getLong(2) == peNum)
    assert(row.getLong(3) == 1000 * agree / n)
    assert(row.getLong(4) == 1000 * peNum / (n * n))
    assert(row.getLong(5) ==
      1000 * (n * agree - peNum) / (n * n - peNum))
    // kappa <= po scaled: chance correction can only lower the score
    assert(row.getLong(5) <= row.getLong(3))
  }

  // ------------------------------------------------------------- q232

  test("q232: bin masses and dup rates match a quality+fingerprint model") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val fpCount = docs.groupBy(identity).map { case (t, g) =>
      t -> g.size
    }
    def quality(t: String): Long = {
      val toks = t.split(" ").filter(_.nonEmpty)
      val nTok = toks.length.toLong
      val stops = Set("the", "a", "of", "and", "in")
      val stopT = toks.count(stops.contains).toLong
      val alpha = t.count(c => c >= 'a' && c <= 'z').toLong
      400 * math.min(nTok, 50) / 50 + 300 * (nTok - stopT) / nTok +
        300 * alpha / t.length
    }
    val expect = docs
      .map(t => (quality(t) / 100, fpCount(t) > 1))
      .groupBy(_._1).map { case (bin, xs) =>
        val nd = xs.length.toLong
        val dups = xs.count(_._2).toLong
        (bin, nd, dups, 1000 * dups / nd)
      }.toSeq.sortBy(_._1)
    val got = EvalOps.q232(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
    assert(got.map(_._2).sum == docs.length.toLong)
  }
}
