package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, EmbeddingOps, GraphRank, ReleaseOps, Similarity}

/** First-principles re-derivations of the round-10 pack #5 (q233-q236):
  * each model recomputes the query contract from collected raw rows with
  * independent Scala arithmetic, plus the invariants the hash gate
  * cannot see (q233's assignment-argmin consistency, q235's handshake
  * symmetry, q236's chi-square significance call).
  */
class StructuralEvalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q233

  test("q233: per-cluster silhouette matches a model over the collected codebook, " +
    "and the trained assignment IS the codebook argmin") {
    val cents = Similarity.kmCentroids(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val members = Similarity.kmClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
      .filter(_._1 < EmbeddingOps.SilPanelMax)
    def d2(qv: Array[Long], cq: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < qv.length) { val d = qv(i) - cq(i); s += d * d; i += 1 }
      s
    }
    // Under the two-level trainer the assignment is CELL-LOCAL (the IVF
    // contract): a(i) = distance to the ASSIGNED centroid — which need
    // not be the global argmin — and b(i) = min over every other
    // centroid, so s can go negative for boundary vectors (that is what
    // the silhouette measures). Scala's Long `/`, Spark's `div` and
    // DuckDB's `//` all truncate toward zero, so the model divides the
    // same way the gated query does.
    var sawGlobalNonArgmin = false
    val perVec = members.map { case (_, emb, cluster) =>
      val qv = emb.map(e => math.floor(e.toDouble * Similarity.KmScale).toLong)
      val dists = cents.map { case (cid, cq) => (cid, d2(qv, cq)) }
      val argmin = dists.minBy { case (cid, d) => (d, cid) }._1
      if (argmin != cluster) sawGlobalNonArgmin = true
      val a = dists.find(_._1 == cluster).get._2
      val b = dists.filter(_._1 != cluster).map(_._2).min
      val s = if (math.max(a, b) == 0) 0L else 1000 * (b - a) / math.max(a, b)
      (cluster.toLong, s, a, b)
    }
    val expect = perVec.groupBy(_._1).map { case (c, xs) =>
      val n = xs.length.toLong
      (c, n, xs.map(_._2).sum / n, xs.map(_._2).min,
        xs.map(_._3).sum / n, xs.map(_._4).sum / n)
    }.toSeq.sortBy(_._1)
    val got = EmbeddingOps.q233(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // scores live in [-1000, 1000]; negatives are legitimate boundary
    // vectors under cell-local assignment
    assert(got.forall(r => r._3 >= -1000 && r._3 <= 1000))
  }

  // ------------------------------------------------------------- q234

  test("q234: matched pairs == a sort/window/jaccard model of SNM blocking") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val candidates = docs
      .groupBy(d => (d._2, d._3.length.toLong / Dedup.SnmBandWidth))
      .toSeq.flatMap { case ((lang, _), xs) =>
        val sorted = xs.map { case (id, _, text) =>
          (id, text.length.toLong, text.split(" ").filter(_.nonEmpty).toSet)
        }.sortBy(t => (t._2, t._1))
        sorted.indices.flatMap { i =>
          (1 until Dedup.SnmWindow).flatMap { j =>
            if (i + j < sorted.length) {
              val (aId, _, aT) = sorted(i)
              val (bId, _, bT) = sorted(i + j)
              val inter = (aT & bT).size.toLong
              val uni = aT.size.toLong + bT.size.toLong - inter
              val jac = if (uni == 0) 0L else 1000 * inter / uni
              Some((lang, aId, bId, jac))
            } else None
          }
        }
      }
    val expect = candidates.filter(_._4 >= Dedup.SnmMinJac)
      .sortBy { case (_, a, b, j) => (-j, a, b) }
      .take(Dedup.SnmTop)
    val got = Dedup.q234(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect)
    // the pair budget is exactly n·(w−1) minus the per-block tail
    val nPairs = docs
      .groupBy(d => (d._2, d._3.length.toLong / Dedup.SnmBandWidth))
      .map { case (_, xs) =>
        val n = xs.size
        (1 until Dedup.SnmWindow).map(j => math.max(0, n - j)).sum
      }.sum
    assert(candidates.length == nPairs)
  }

  // ------------------------------------------------------------- q235

  test("q235: assortativity matches a degree-correlation model with handshake symmetry") {
    val edges = GraphRank.syndicationEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ue = edges.map { case (a, b) =>
      (Seq(a, b).min, Seq(a, b).max)
    }.distinct
    assert(ue.nonEmpty, "fixture graph has no edges — model not exercised")
    val deg = ue.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    val sym = ue.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u)))
    }
    val m2 = sym.length.toLong
    val sx = sym.map(_._1).sum; val sy = sym.map(_._2).sum
    val sxx = sym.map(t => t._1 * t._1).sum
    val syy = sym.map(t => t._2 * t._2).sum
    val sxy = sym.map(t => t._1 * t._2).sum
    assert(sx == sy && sxx == syy, "handshake symmetrization broken")
    assert(m2 == 2L * ue.length)
    val num = m2.toDouble * sxy - sx.toDouble * sy
    val den = math.sqrt(math.max(m2.toDouble * sxx - sx.toDouble * sx, 0)) *
      math.sqrt(math.max(m2.toDouble * syy - sy.toDouble * sy, 0))
    val expectR =
      if (den == 0) None
      else Some(BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val row = GraphRank.q235(spark, sfDir).collect().head
    assert(row.getLong(0) == deg.size.toLong)
    assert(row.getLong(1) == ue.length.toLong)
    assert(row.getLong(2) == sxy)
    val gotR = if (row.isNullAt(3)) None else Some(row.getDouble(3))
    assert(gotR == expectR)
    gotR.foreach(r => assert(r >= -1.0 && r <= 1.0))
  }

  // ------------------------------------------------------------- q236

  test("q236: cells, margins and contributions match an independent split model; " +
    "the uniform hash split is not rejected at alpha=0.05") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def splitOf(id: Long): String = {
      val bucket = ShingleModel.h60(s"split:$id") % 1000
      if (bucket < 900) "train" else if (bucket < 950) "val" else "test"
    }
    val cells = docs.groupBy { case (id, lang) => (lang, splitOf(id)) }
      .map { case (k, g) => (k._1, k._2, g.size.toLong) }.toSeq
    val n = docs.length.toLong
    val rowT = cells.groupBy(_._1).map { case (l, g) => l -> g.map(_._3).sum }
    val colT = cells.groupBy(_._2).map { case (s, g) => s -> g.map(_._3).sum }
    val expect = cells.map { case (lang, split, o) =>
      val rt = rowT(lang); val ct = colT(split)
      val dlt = (n * o - rt * ct).toDouble
      (lang, split, o, 1000 * rt * ct / n,
        dlt * dlt / (n.toDouble * rt.toDouble * ct.toDouble))
    }.sortBy(t => (t._1, t._2))
    val got = ReleaseOps.q236(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expect)
    assert(got.map(_._3).sum == n)
    // significance: the hash split is uniform by construction, so the
    // lang×split test must NOT reject at alpha=0.05 (df-matched
    // critical value)
    val df = (rowT.size - 1) * (colT.size - 1)
    val crit = Map(2 -> 5.99, 4 -> 9.49, 6 -> 12.59, 8 -> 15.51)
      .getOrElse(df, fail(s"unexpected df=$df (langs=${rowT.size}, " +
        s"splits=${colT.size}) — extend the critical-value table"))
    val chi2 = got.map(_._5).sum
    assert(chi2 < crit,
      f"hash split correlates with lang: chi2=$chi2%.2f > crit($df)=$crit")
  }
}
