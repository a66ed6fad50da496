package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EmbeddingOps, Similarity}

/** First-principles re-derivations of the round-10 pack #6 (q237-q239):
  * independent Scala models of the JL projector + distortion audit, the
  * hard-negative miner, and the purity rollup, over collected raw rows.
  */
class EmbeddingOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q237

  test("q237: distortion audit matches an independent JL model; the sign " +
    "matrix is balanced and the mean distortion is near 1000") {
    // independent sign model from the shared md5-h60 contract
    def sign(d: Int, j: Int): Long =
      if (ShingleModel.h60(s"jl:$d:$j") % 2 == 0) 1L else -1L
    // the matrix must be roughly balanced or the projector is biased
    val ones = (for (j <- 0 until EmbeddingOps.JlOutDim;
                     d <- 1 to EmbeddingOps.JlInDim)
      yield sign(d, j)).count(_ == 1L)
    assert(math.abs(ones - 512) < 200, s"sign matrix skewed: $ones of 1024")

    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter(t => t._2.length == EmbeddingOps.JlInDim &&
        t._1 < EmbeddingOps.JlPanelMax)
      .sortBy(_._1)
    val q = vecs.map { case (id, e) =>
      (id, e.map(x => math.floor(x.toDouble * 10000).toLong))
    }
    def proj(qv: Array[Long]): Array[Long] =
      Array.tabulate(EmbeddingOps.JlOutDim) { j =>
        var s = 0L; var d = 0
        while (d < EmbeddingOps.JlInDim) { s += sign(d + 1, j) * qv(d); d += 1 }
        s
      }
    val ys = q.map { case (id, qv) => (id, qv, proj(qv)) }
    val dists = for {
      i <- ys.indices; k <- ys.indices if ys(i)._1 < ys(k)._1
    } yield {
      val d2o = ys(i)._2.zip(ys(k)._2).map { case (a, b) =>
        (a - b) * (a - b)
      }.sum
      val d2p = ys(i)._3.zip(ys(k)._3).map { case (a, b) =>
        (a - b) * (a - b)
      }.sum
      if (d2o == 0) 1000L else 1000 * d2p / (EmbeddingOps.JlOutDim * d2o)
    }
    val n = dists.length.toLong
    val inBand = dists.count(d =>
      d >= EmbeddingOps.JlBandLo && d <= EmbeddingOps.JlBandHi).toLong
    val expect = (n, dists.sum / n, dists.min, dists.max, inBand,
      1000 * inBand / n)
    val r = EmbeddingOps.q237(spark, sfDir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
    assert(got == expect)
    // JL sanity: with k=16 the mean distortion concentrates near the
    // expectation 1000 even though single pairs swing ±35%
    assert(got._2 > 600 && got._2 < 1400, s"mean distortion ${got._2}")
  }

  // ------------------------------------------------------------- q238

  /** Left-to-right double cosine — the element order both the native
    * expression and the oracle's unnest-sum walk. */
  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < a.length) {
      xy += a(i).toDouble * b(i).toDouble
      xx += a(i).toDouble * a(i).toDouble
      yy += b(i).toDouble * b(i).toDouble
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  test("q238: hard negatives match an in-cluster different-label ranking model") {
    val labels = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue()).toMap
    val members = Similarity.kmClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    val byCluster = members.groupBy(_._3)
    val expect = members
      .filter(m => m._1 >= 20 && m._1 <= 29)
      .sortBy(_._1)
      .flatMap { case (pid, pe, cluster) =>
        val pl = labels(pid)
        byCluster(cluster)
          .filter(c => c._1 != pid && labels(c._1) != pl)
          .map { case (nid, ne, _) =>
            (nid, labels(nid),
              math.floor(cosine(pe, ne) * 1000000).toLong)
          }
          .sortBy { case (nid, _, sm) => (-sm, nid) }
          .take(EmbeddingOps.HardNegK)
          .zipWithIndex
          .map { case ((nid, nl, sm), i) =>
            (pid, pl, i + 1L, nid, nl, sm)
          }
      }.toSeq
    val got = EmbeddingOps.q238(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // every reported negative really is a different label
    assert(got.forall(r => r._2 != r._5))
  }

  // ------------------------------------------------------------- q239

  test("q239: purity matches a majority-label model; mass sums to the corpus") {
    val labels = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("label").longValue()).toMap
    val members = Similarity.kmClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val expect = members.groupBy(_._2).map { case (c, xs) =>
      val counts = xs.map(m => labels(m._1)).groupBy(identity)
        .map { case (l, g) => (l, g.size.toLong) }
      val (majL, majC) = counts.toSeq.sortBy { case (l, n) => (-n, l) }.head
      val n = xs.length.toLong
      (c.toLong, n, majL, majC, 1000 * majC / n)
    }.toSeq.sortBy(_._1)
    val got = EmbeddingOps.q239(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    assert(got.map(_._2).sum == members.length.toLong)
    // purity can never undercut the uniform floor of its own cluster
    assert(got.forall(r => r._5 >= 1000 / math.max(1, labels.values.toSet.size)))
  }
}
