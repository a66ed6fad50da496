package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** q160's wedge join on synthetic graphs: the skew probe VERDICT r8
  * asked for. The census's Σ deg² bound rests on the hot-bucket /
  * df caps holding per-node degree down — this spec constructs a hub at
  * EXACTLY the [[Dedup.MaxBucketDocs]] cap and pins the wedge fan-out
  * to its closed form, so a future cap change (or a broken orientation
  * that double-counts wedges) fails loudly here rather than as an
  * unexplained quadratic blow-up at sf1.
  */
class TriangleCensusSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private def edgeDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    // census contract: id-oriented edges (doc_a < doc_b)
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")
  }

  test("near-cap hub: wedge fan-out is exactly cap*(cap-1)/2, no triangles") {
    val h = Dedup.MaxBucketDocs // 256 — a bucket at the cap
    val star = edgeDf((1L to h.toLong).map(i => (0L, i)))
    val wedges = Dedup.wedgeFrame(star).count()
    assert(wedges == h.toLong * (h - 1) / 2,
      s"hub of degree $h must fan out to C($h,2) wedges, got $wedges")
    // a star is triangle-free: the census is empty
    assert(Dedup.triangleCensus(star, topK = 100).count() == 0)
  }

  test("wheel: rim closure turns every rim edge into one hub triangle") {
    val h = 64L
    val spokes = (1L to h).map(i => (0L, i))
    val rim = (1L until h).map(i => (i, i + 1))
    val census = Dedup.triangleCensus(edgeDf(spokes ++ rim), topK = 200)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hub: degree h, one triangle per rim edge
    assert(census(0L) == (h, h - 1))
    // rim interior nodes: degree 3 (hub + two rim neighbors), 2 triangles
    assert(census(2L) == (3L, 2L))
    // rim endpoints: degree 2, 1 triangle, clustering = 1000
    assert(census(1L) == (2L, 1L))
  }

  test("clique: every node fully clustered at permille 1000") {
    val k = 8L
    val edges = edgeDf(for {
      i <- 1L to k; j <- (i + 1) to k
    } yield (i, j))
    val rows = Dedup.triangleCensus(edges, topK = 100).collect()
    assert(rows.length == k)
    rows.foreach { r =>
      assert(r.getLong(1) == k - 1) // degree
      assert(r.getLong(2) == (k - 1) * (k - 2) / 2) // C(k-1, 2) triangles
      assert(r.getLong(3) == 1000L) // clustering_permille
    }
  }

  test("chain: pairwise matches without closure produce zero triangles") {
    val chain = edgeDf((1L until 50L).map(i => (i, i + 1)))
    assert(Dedup.triangleCensus(chain, topK = 100).count() == 0)
  }
}
