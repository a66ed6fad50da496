package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.RetrievalOps

/** First-principles re-derivations of the round-10 pack #10 (q250-q251):
  * the greedy MMR trace and the k-NN disagreement screen recomputed from
  * collected embeddings with an independent cosine fold and greedy loop,
  * plus the diversity invariant the hash gate cannot express (the MMR
  * set is never MORE redundant than the plain top-k).
  */
class MmrLabelNoiseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb: Array[(Long, Long, Array[Double])] = spark.read
    .parquet(s"$sfDir/embeddings.parquet")
    .select("vec_id", "label", "embedding").collect()
    .map(r => (r.getLong(0), r.getInt(1).toLong,
      r.getSeq[Float](2).toArray.map(_.toDouble)))
    .filter(_._3.length == 64)

  private def micro(a: Array[Double], b: Array[Double]): Long = {
    var xy = 0d; var xx = 0d; var yy = 0d; var i = 0
    while (i < a.length) {
      xy += a(i) * b(i); xx += a(i) * a(i); yy += b(i) * b(i); i += 1
    }
    math.floor(xy / (math.sqrt(xx) * math.sqrt(yy)) * 1000000d).toLong
  }

  // ------------------------------------------------------------- q250

  test("q250: the greedy MMR trace matches an independent model, and " +
    "the selected set is less redundant than the plain top-k") {
    val byId = emb.map(e => (e._1, e._3)).toMap
    val probes = emb.filter(e => e._1 % 37 == 0 && e._1 < 1850)
    assert(probes.nonEmpty)
    val expect = probes.flatMap { case (pid, _, pe) =>
      val pool = emb.filter(_._1 != pid)
        .map { case (nid, _, ce) => (nid, micro(pe, ce)) }
        .sortBy { case (nid, sm) => (-sm, nid) }
        .take(RetrievalOps.MmrPoolK)
      var sel = List(pool.minBy { case (nid, sm) => (-sm, nid) })
      var trace = List((pid, 1L, sel.head._1, sel.head._2, sel.head._2))
      for (r <- 2 to RetrievalOps.MmrSelK) {
        val selIds = sel.map(_._1).toSet
        val scored = pool.filterNot(c => selIds.contains(c._1))
          .map { case (nid, smq) =>
            val pen = sel.map(s => micro(byId(nid), byId(s._1))).max
            (nid, smq, smq - pen)
          }
        val pick = scored.minBy { case (nid, _, s2) => (-s2, nid) }
        sel = sel :+ (pick._1, pick._2)
        trace = trace :+ ((pid, r.toLong, pick._1, pick._2, pick._3))
      }
      // diversity invariant: mean pairwise sim of the MMR set does not
      // exceed that of the plain top-MmrSelK set
      def meanPair(ids: Seq[Long]): Double = {
        val ps = for {
          a <- ids; b <- ids if a < b
        } yield micro(byId(a), byId(b)).toDouble
        ps.sum / ps.length
      }
      val mmrIds = trace.map(_._3)
      val topIds = pool.take(RetrievalOps.MmrSelK).map(_._1).toSeq
      assert(meanPair(mmrIds) <= meanPair(topIds) + 1e-9,
        s"probe $pid: MMR set more redundant than plain top-k")
      trace
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = RetrievalOps.q250(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
  }

  // ------------------------------------------------------------- q251

  test("q251: per-label disagreement and suspect counts match a " +
    "brute-force k-NN model") {
    val probes = emb.filter(e => e._1 % 41 == 0 && e._1 < 4100)
    assert(probes.nonEmpty)
    val per = probes.map { case (pid, pl, pe) =>
      val nn = emb.filter(_._1 != pid)
        .map { case (nid, nl, ce) => (nid, nl, micro(pe, ce)) }
        .sortBy { case (nid, _, sm) => (-sm, nid) }
        .take(RetrievalOps.NoiseK)
      (pl, nn.count(_._2 != pl).toLong)
    }
    val expect = per.groupBy(_._1).map { case (l, xs) =>
      (l, xs.length.toLong,
        1000 * xs.map(_._2).sum / (RetrievalOps.NoiseK * xs.length),
        xs.count(_._2 * 2 > RetrievalOps.NoiseK).toLong)
    }.toSeq.sortBy(_._1)
    val got = RetrievalOps.q251(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
  }
}
