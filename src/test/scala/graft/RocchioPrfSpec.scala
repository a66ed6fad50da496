package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RetrievalOps

/** First-principles re-derivations of the round-10 pack #9 (q248-q249):
  * the Rocchio two-pass retrieval and the negative-sampling table are
  * recomputed from collected raw rows with independent Scala arithmetic
  * (cosine fold, micro-sim floor, integer centroid, md5 draw hash all
  * REIMPLEMENTED — never called).
  */
class RocchioPrfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  // ------------------------------------------------------------- q248

  test("q248: both retrieval passes, the integer feedback vector, and " +
    "the hit counts match an independent model") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray))
      .filter(_._3.length == 64)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var xy = 0d; var xx = 0d; var yy = 0d; var i = 0
      while (i < a.length) {
        xy += a(i) * b(i); xx += a(i) * a(i); yy += b(i) * b(i); i += 1
      }
      xy / (math.sqrt(xx) * math.sqrt(yy))
    }
    def micro(a: Array[Double], b: Array[Double]): Long =
      math.floor(cos(a, b) * 1000000d).toLong
    def topK(pe: Array[Double], pid: Long): Seq[(Long, Long)] =
      emb.filter(_._1 != pid)
        .map { case (nid, nl, ce) =>
          (nid, nl, micro(pe, ce.map(_.toDouble))) }
        .sortBy { case (nid, _, sm) => (-sm, nid) }
        .take(RetrievalOps.PrfK)
        .map { case (nid, nl, _) => (nid, nl) }.toSeq
    val labCnt = emb.groupBy(_._2).map { case (l, xs) => (l, xs.length) }
    val probes = emb.filter(e => e._1 % 31 == 0 && e._1 < 3100)
    assert(probes.nonEmpty)
    val expect = probes.map { case (pid, pl, pe) =>
      val ped = pe.map(_.toDouble)
      val t1 = topK(ped, pid)
      val qv = pe.map(x => math.floor(x.toDouble * 10000d).toLong)
      val nr = t1.length.toLong
      val byId = emb.map(e => (e._1, e._3)).toMap
      val fb = Array.fill(64)(0L)
      t1.foreach { case (nid, _) =>
        val nqv = byId(nid).map(x => math.floor(x.toDouble * 10000d).toLong)
        for (d <- 0 until 64) fb(d) += nqv(d)
      }
      val pe2 = Array.tabulate(64)(d => (nr * qv(d) + fb(d)).toFloat.toDouble)
      val t2 = topK(pe2, pid)
      val hb = t1.count(_._2 == pl).toLong
      val ha = t2.count(_._2 == pl).toLong
      (pid, pl, labCnt(pl).toLong - 1, hb, ha, ha - hb)
    }.sortBy(_._1).toSeq
    val got = RetrievalOps.q248(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the readout is live: hits are bounded by k and by the relevant set
    got.foreach { case (_, _, nRel, hb, ha, _) =>
      assert(hb <= RetrievalOps.PrfK && ha <= RetrievalOps.PrfK)
      assert(hb <= nRel && ha <= nRel)
    }
  }

  // ------------------------------------------------------------- q249

  test("q249: sampling table and drawn distribution match an " +
    "independent model; draws land close to target") {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val top = toks.groupBy(identity).toSeq
      .map { case (t, xs) => (t, xs.length.toLong) }
      .sortBy { case (t, c) => (-c, t) }
      .take(RetrievalOps.NegVocab)
    val wq = top.map { case (t, c) =>
      (t, c, math.floor(
        math.sqrt(c.toDouble * math.sqrt(c.toDouble)) * 1000d).toLong)
    }
    val his = wq.scanLeft(0L)(_ + _._3).tail
    val total = his.last
    val sampled = scala.collection.mutable.Map.empty[String, Long]
    for (i <- 0L until RetrievalOps.NegDraws) {
      val u = h60(s"negdraw:$i") % total
      // first index whose hi exceeds u
      var loI = 0; var hiI = his.length - 1
      while (loI < hiI) {
        val m = (loI + hiI) / 2
        if (his(m) > u) hiI = m else loI = m + 1
      }
      val t = wq(loI)._1
      sampled(t) = sampled.getOrElse(t, 0L) + 1
    }
    val expect = wq.take(20).map { case (t, c, w) =>
      val n = sampled.getOrElse(t, 0L)
      (t, c, w, 1000 * w / total, n, 1000 * n / RetrievalOps.NegDraws)
    }
    val got = RetrievalOps.q249(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the table must be DRAWABLE: with 10k draws the sampled share of
    // each top-20 token sits within a few permille of its target
    got.foreach { case (t, _, _, target, _, s) =>
      assert(math.abs(target - s) <= 10,
        s"token $t drawn ${s} permille vs target $target")
    }
  }
}
