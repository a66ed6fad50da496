package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity3

/** q158/q159 (product quantization): search-quality floor against an
  * independent exact model, index-audit invariants, and rerun
  * determinism of the trained codebook path.
  */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  /** Exact int64 squared-L2 top-k per probe, straight from the parquet
    * floats — no shared code with the query under test.
    */
  private def exactTopK(k: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        (id, v.map(x => math.floor(x.toDouble * 10000d).toLong).toArray)
      }
    val probes = vecs.filter { case (id, _) =>
      id >= Similarity3.PqProbeLo && id <= Similarity3.PqProbeHi
    }
    probes.map { case (pid, pv) =>
      val top = vecs.filter(_._1 != pid)
        .map { case (nid, nv) =>
          val d = pv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, nid)
        }
        .sortBy(identity).take(k).map(_._2).toSeq
      pid -> top
    }.toMap
  }

  test("q158 two-stage search recovers the exact top-3 (recall floor)") {
    val exact = exactTopK(Similarity3.PqTopK)
    val got = Similarity3.q158(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (p, rows) => p -> rows.map(_.getLong(1)).toSet }
    assert(got.keySet == exact.keySet)
    got.foreach { case (_, ns) => assert(ns.size == Similarity3.PqTopK) }
    val overlap = exact.map { case (p, ex) => (got(p) & ex.toSet).size }.sum
    val total = exact.size * Similarity3.PqTopK
    // measured 15/15 on this corpus; the floor leaves slack for a
    // regenerated corpus without accepting a broken shortlist
    assert(overlap >= total - 2,
      s"shortlist+re-rank recall collapsed: $overlap/$total")
  }

  test("q158 re-rank orders by exact distance, not ADC estimate") {
    val rows = Similarity3.q158(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).values.foreach { g =>
      val byRnk = g.sortBy(_._3).map(_._2).toSeq
      assert(byRnk == byRnk.sorted,
        s"exact_dist must be non-decreasing in rnk: ${g.toSeq}")
    }
  }

  test("q159 residual audit invariants") {
    val rows = Similarity3.q159(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0L until Similarity3.PqM.toLong),
      "one row per subspace, ordered")
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    rows.foreach { case (s, n, avg, mx, used) =>
      assert(n == nVecs, s"subspace $s must code every vector")
      assert(avg >= 0 && avg <= mx, s"subspace $s: avg $avg > max $mx")
      assert(used >= 2 && used <= Similarity3.PqK,
        s"subspace $s uses $used codes — degenerate codebook")
    }
  }

  test("q262 opqMap is a signed permutation; gains bounded; rotated " +
    "training preserves the corpus") {
    val dim = 64
    val srcs = Similarity3.opqMap.map(_._1)
    assert(srcs.sorted.toSeq == (1 to dim), "sources must be a permutation")
    assert(Similarity3.opqMap.forall(m => m._2 == 1 || m._2 == -1))
    val rows = Similarity3.q262(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0L until 16L), "one row per subspace")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.forall(_._2 == n), "every subspace encodes every vector")
    assert(rows.forall(r => r._3 >= 0 && r._4 >= 0), "residuals non-negative")
    assert(rows.forall(r => r._5 >= -1000 && r._5 <= 1000),
      "gain permille bounded")
  }

  test("the trained PQ pipeline is rerun-deterministic") {
    val a = Similarity3.q158(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = Similarity3.q158(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
