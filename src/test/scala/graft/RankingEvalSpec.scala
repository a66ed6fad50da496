package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EvalOps

/** First-principles re-derivations of the round-10 pack #8 (q243-q247):
  * every model below recomputes the query contract from collected raw
  * rows with independent Scala arithmetic — the quality score, the md5
  * split hash, and the sign-LSH banding are all REIMPLEMENTED here (not
  * called), so a defect in the engine-side single-copy helpers cannot
  * self-certify.
  */
class RankingEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // -- independent model helpers -------------------------------------

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Independent h60: first 15 hex chars of md5, parsed base 16. */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  private val Stops = Set("the", "a", "of", "and", "in")

  /** Independent q_u3 (the integer quality score). */
  private def qualU3(text: String): Long = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val nTok = toks.length.toLong
    val stops = toks.count(Stops.contains).toLong
    val alpha = text.count(c => c >= 'a' && c <= 'z').toLong
    val nChars = text.length.toLong
    400 * math.min(nTok, 50) / 50 + 300 * (nTok - stops) / nTok +
      300 * alpha / nChars
  }

  private case class Doc(id: Long, lang: String, text: String)

  private lazy val docs: Array[Doc] = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "text").collect()
    .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2)))

  // ------------------------------------------------------------- q243

  test("q243: rank-sum AUC equals the brute-force pairwise count") {
    // sf0.1: the smallest fixture with exact-dup positives (below it
    // the query degenerates to n_pos=0 / NULL AUC, which the sf0.01
    // hash gate already pins — the two gates cover both regimes)
    val aucDir = "/root/testdata/sf0.1"
    val aucDocs = spark.read.parquet(s"$aucDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2)))
    val byFp = aucDocs.groupBy(d => md5Hex(d.text))
    val labeled = aucDocs.map { d =>
      (qualU3(d.text), byFp(md5Hex(d.text)).length > 1)
    }
    val pos = labeled.filter(_._2).map(_._1)
    val neg = labeled.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty,
      "fixture must exercise both classes")
    // brute force: 2*U = 2*wins + ties over ALL pos x neg pairs
    var u2 = 0L
    for (p <- pos; n <- neg)
      u2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val aucPermille = 1000 * u2 / (2L * pos.length * neg.length)
    val r = EvalOps.q243(spark, aucDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == pos.length.toLong)
    assert(r(0).getLong(1) == neg.length.toLong)
    assert(r(0).getLong(2) == u2, "doubled U statistic")
    assert(r(0).getLong(3) == aucPermille)
  }

  // ------------------------------------------------------------- q244

  test("q244: held-out KN surprisal matches an independent model " +
    "(split hash, counts, piecewise rational, bit-length floor-log2)") {
    def split(id: Long): String = {
      val b = h60(s"split:$id") % 1000
      if (b < 900) "train" else if (b < 950) "val" else "test"
    }
    def bigrams(text: String): Seq[(String, String)] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 2) Seq.empty else t.dropRight(1).zip(t.drop(1)).toSeq
    }
    val train = docs.filter(d => split(d.id) == "train")
    val eval = docs.filter(d => split(d.id) != "train")
    assert(train.nonEmpty && eval.nonEmpty)
    val bc = train.flatMap(d => bigrams(d.text))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val ctx = bc.groupBy(_._1._1).map { case (p, m) =>
      (p, (m.values.sum, m.size.toLong))
    } // prev -> (ccnt, n1p)
    val cont = bc.groupBy(_._1._2).map { case (c, m) => (c, m.size.toLong) }
    val nbt = bc.size.toLong
    def bitlen(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)
    def surp(prev: String, cur: String): Long = ctx.get(prev) match {
      case None => bitlen(4 * nbt) - 1
      case Some((ccnt, n1p)) =>
        val c = bc.getOrElse((prev, cur), 0L)
        val num = nbt * (if (c == 0) 0L else 4 * c - 3) +
          3 * n1p * cont.getOrElse(cur, 0L)
        if (num <= 0) bitlen(4 * nbt) - 1
        else {
          assert(num <= 4 * ccnt * nbt, "P <= 1 must hold termwise")
          bitlen(4 * ccnt * nbt / num) - 1
        }
    }
    val expect = eval.flatMap { d =>
      bigrams(d.text).map { case (p, c) =>
        val seen = ctx.contains(p)
        (d.lang, 1L, if (!seen) 1L else 0L,
          if (seen && !bc.contains((p, c))) 1L else 0L, surp(p, c))
      }
    }.groupBy(_._1).map { case (lang, xs) =>
      val n = xs.map(_._2).sum
      (lang, n, xs.map(_._3).sum, xs.map(_._4).sum, xs.map(_._5).sum,
        1000 * xs.map(_._5).sum / n)
    }.toSeq.sortBy(_._1)
    val got = EvalOps.q244(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the smoothing must actually be exercised: unseen bigrams exist
    assert(expect.map(_._4).sum > 0, "no unseen eval bigram at sf0.001")
  }

  // ------------------------------------------------------------- q245

  test("q245: the cut is the loosest threshold meeting the token " +
    "budget, selection totals match a model over raw rows") {
    val byLang = docs.groupBy(_.lang)
    val expect = byLang.toSeq.map { case (lang, ds) =>
      val scored = ds.map(d =>
        (qualU3(d.text), d.text.split(" ").count(_.nonEmpty).toLong))
      val tot = scored.map(_._2).sum
      val target = 3 * tot / 10
      // walk scores descending, accumulate until the budget is met
      val byQ = scored.groupBy(_._1).toSeq.sortBy(-_._1)
      var cum = 0L; var cumD = 0L
      var cut = -1L; var selT = 0L; var selD = 0L
      for ((q, xs) <- byQ if cut < 0) {
        cum += xs.map(_._2).sum; cumD += xs.length
        if (cum >= target) { cut = q; selT = cum; selD = cumD }
      }
      (lang, ds.length.toLong, tot, target, cut, selD, selT,
        1000 * (selT - target) / target)
    }.sortBy(_._1)
    val got = EvalOps.q245(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expect)
    // the cut must be LOOSEST: one score step looser overshoots the
    // budget from below for at least one language (selection minimal)
    got.foreach { case (_, _, _, target, _, _, selT, _) =>
      assert(selT >= target)
    }
  }

  // ------------------------------------------------------------- q246

  test("q246: alignment audit matches an independent sign-LSH + " +
    "quantized-L2 model, and candidates ARE closer than random") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter(_._2.length == 64)
    val planes = Array.tabulate(32, 64)((j, d) =>
      math.floor(graft.functions.SignLSH.planeComponent(j, d) * 1000.0)
        .toLong)
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000.0).toLong)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val sample = emb.filter(_._1 % 4 == 0)
    val qs = sample.map { case (id, v) => (id, quant(v)) }.toMap
    // independent banding: 32 integer dots -> 4 bands x 8 sign bits
    def bands(v: Array[Float]): Seq[(Int, Long)] = {
      val xq = quant(v)
      (0 until 4).map { b =>
        var bv = 0L
        for (i <- 0 until 8) {
          val j = b * 8 + i
          var dot = 0L
          for (d <- 0 until 64) dot += xq(d) * planes(j)(d)
          if (dot >= 0) bv |= (1L << i)
        }
        (b, bv)
      }
    }
    val buckets = scala.collection.mutable.Map
      .empty[(Int, Long), List[Long]]
    sample.foreach { case (id, v) =>
      bands(v).foreach(k => buckets(k) = id :: buckets.getOrElse(k, Nil))
    }
    val pairs = buckets.values.flatMap { ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    assert(pairs.nonEmpty, "fixture must produce candidate pairs")
    val posD2 = pairs.toSeq.map { case (a, b) => d2(qs(a), qs(b)) }
    val panel = emb.filter(e => e._1 % 29 == 0 && e._1 < 2900)
      .map { case (id, v) => (id, quant(v)) }
    val baseD2 = for {
      (ia, va) <- panel; (ib, vb) <- panel if ia < ib
    } yield d2(va, vb)
    val meanPos = posD2.sum / posD2.length
    val meanBase = baseD2.sum / baseD2.length
    val r = EvalOps.q246(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == posD2.length.toLong)
    assert(r(0).getLong(1) == meanPos)
    assert(r(0).getLong(2) == baseD2.length.toLong)
    assert(r(0).getLong(3) == meanBase)
    assert(r(0).getLong(4) == 1000 * meanPos / meanBase)
    // the audit's point: the index proposes CLOSER-than-random pairs
    assert(meanPos < meanBase,
      "sign-LSH candidates should beat the random baseline")
  }

  // ------------------------------------------------------------- q247

  test("q247: padding waste matches ceil-chunk arithmetic per context") {
    val ntoks = docs.map(_.text.split(" ").count(_.nonEmpty).toLong)
    val nTokens = ntoks.sum
    val expect = Seq(512L, 1024L, 2048L, 4096L).map { c =>
      val seqs = ntoks.map(n => (n + c - 1) / c).sum
      val padded = seqs * c
      (c, docs.length.toLong, nTokens, seqs, padded,
        1000 * (padded - nTokens) / padded)
    }
    val got = EvalOps.q247(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // waste must be monotone nondecreasing in ctx for naive batching
    assert(got.map(_._6) == got.map(_._6).sorted)
  }
}
