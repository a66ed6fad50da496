package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeans

/** Distributed Lloyd's k-means: recovers separable blobs, WCSS is
  * monotonically non-increasing, and the fit is deterministic.
  */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  /** 3 well-separated blobs in 4-d; blob = id % 3 so the 3 lowest-id
    * seed vectors land in distinct blobs.
    */
  private def blobs() = {
    import spark.implicits._
    val centers = Array(
      Array(0f, 0f, 0f, 0f),
      Array(10f, 10f, 10f, 10f),
      Array(-10f, 10f, -10f, 10f))
    (0L until 180L).map { id =>
      val c = centers((id % 3).toInt)
      val jitter = (id % 7).toFloat * 0.01f
      (id, c.map(_ + jitter))
    }.toDF("id", "vec")
  }

  test("recovers 3 separable blobs and converges") {
    val r = KMeans.fit(blobs(), "id", "vec", k = 3)
    assert(r.iterations < 20, s"did not converge: ${r.iterations}")
    assert(r.wcss.size == r.iterations)
    r.wcss.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"WCSS rose: $a -> $b")
      case _ =>
    }
    val byBlob = r.assignments.collect()
      .map(row => (row.getLong(0) % 3, row.getInt(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    // every blob maps to exactly one cluster, and the 3 clusters differ
    assert(byBlob.values.forall(_.size == 1), s"split blob: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"merged blobs: $byBlob")
  }

  test("fit is deterministic across runs") {
    val a = KMeans.fit(blobs(), "id", "vec", k = 3)
    val b = KMeans.fit(blobs(), "id", "vec", k = 3)
    assert(a.centroids.map(_._2.toSeq).toSeq == b.centroids.map(_._2.toSeq).toSeq)
    val ra = a.assignments.collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    val rb = b.assignments.collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(ra == rb)
  }

  test("emptied clusters keep their centroid; k=1 degenerates cleanly") {
    val r = KMeans.fit(blobs(), "id", "vec", k = 1)
    assert(r.centroids.length == 1)
    assert(r.assignments.collect().forall(_.getInt(2) == 0))
  }

  test("fitQuantized recovers the blobs and is partitioning-invariant") {
    // The float trainer is deterministic per physical plan but its avg
    // is FP-order-sensitive in principle; the quantized trainer must
    // produce the IDENTICAL codebook under any repartitioning/row order
    // — that is its contract (and what lets q94 sit under the oracle).
    val base = blobs()
    val a = KMeans.fitQuantized(base, "id", "vec", k = 3, iters = 3)
    val b = KMeans.fitQuantized(
      base.repartition(13).sortWithinPartitions(org.apache.spark.sql.functions.col("id").desc),
      "id", "vec", k = 3, iters = 3)
    assert(a.centroids.map(_._2.toSeq).toSeq == b.centroids.map(_._2.toSeq).toSeq)
    val ra = a.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val rb = b.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(ra == rb)
    // and it still solves the clustering problem
    val byBlob = ra.map { case (id, c) => (id % 3, c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byBlob.values.forall(_.size == 1), s"split blob: $byBlob")
    assert(byBlob.values.flatten.toSet.size == 3, s"merged blobs: $byBlob")
  }

  test("fitQuantized centroids match a driver-side exact-integer Lloyd") {
    // Independent single-threaded reimplementation over the same rows —
    // the distributed trainer must agree bit-for-bit.
    val rows = blobs().collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val scale = 10000L
    val q = rows.map { case (id, v) => (id, v.map(x => math.floor(x.toDouble * scale).toLong)) }
    var cents = q.take(3).zipWithIndex.map { case ((_, v), i) => (i, v.clone()) }
    for (_ <- 1 to 3) {
      val asg = q.map { case (id, x) =>
        val best = cents.map { case (c, ce) =>
          (x.zip(ce).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }.min
        (id, x, best._2)
      }
      cents = cents.map { case (c, old) =>
        val members = asg.filter(_._3 == c).map(_._2)
        if (members.isEmpty) (c, old)
        else (c, Array.tabulate(old.length)(d =>
          math.floor(members.map(_(d)).sum.toDouble / members.length).toLong))
      }
    }
    val dist = KMeans.fitQuantized(blobs(), "id", "vec", k = 3, iters = 3)
    assert(dist.centroids.map(_._2.toSeq).toSeq == cents.map(_._2.toSeq).toSeq)
  }

  test("ceilSqrt: proven-by-multiplication ceil of the integer sqrt") {
    for (k <- (1L to 200L) ++ Seq(5000L, 1000000L, 4999999L, 5000000L)) {
      val r = KMeans.ceilSqrt(k).toLong
      assert(r * r >= k && (r == 1 || (r - 1) * (r - 1) < k), s"k=$k -> $r")
    }
  }

  test("fitTwoLevel recovers blobs through the coarse/fine split and is " +
    "partitioning-invariant") {
    val base = blobs()
    val a = KMeans.fitTwoLevel(base, "id", "vec", k = 5,
      coarseIters = 3, fineIters = 3)
    val b = KMeans.fitTwoLevel(
      base.repartition(13).sortWithinPartitions(
        org.apache.spark.sql.functions.col("id").desc),
      "id", "vec", k = 5, coarseIters = 3, fineIters = 3)
    val ra = a.assignments.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val rb = b.assignments.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(ra == rb, "two-level assignment must be partitioning-invariant")
    val ca = a.centroids.collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1).toSeq
    val cb = b.centroids.collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1).toSeq
    assert(ca == cb, "two-level codebook must be partitioning-invariant")
    // k=5 splits the 3 blobs into 5 clusters: members of one cluster
    // must never span two blobs (blobs are 17+ apart, jitter ≤ 0.07)
    val byCluster = ra.groupBy(_._2).view
      .mapValues(_.map(_._1 % 3).distinct).toMap
    assert(byCluster.values.forall(_.size == 1), s"cluster spans blobs: $byCluster")
    assert(ca.map(_._1) == ca.indices.map(_.toLong), "contiguous cent_ids")
    assert(ca.size == 5, "Hamilton seats must total k when no cap binds")
  }

  test("fitTwoLevel survives a dominant coarse cell (seed-window skew bound)") {
    // The fine-seed pass runs ONE window task per coarse cell (see the
    // skew-bound note at wSeed in KMeans.fitTwoLevel); this corpus drives
    // ~95% of rows into a single cell — the degenerate shape that task
    // must absorb — and the trainer must still emit a full contiguous
    // k-seat codebook, stay partitioning-invariant, and keep the packed
    // blob's clusters disjoint from the outliers'.
    import spark.implicits._
    val dominant = (0L until 95L).map(id =>
      (id, Array.tabulate(4)(d => ((id % 7) + d).toFloat * 0.01f)))
    val outliers = (95L until 100L).map(id =>
      (id, Array.fill(4)(100f + (id - 95L) * 40f)))
    val base = (dominant ++ outliers).toDF("id", "vec")
    val a = KMeans.fitTwoLevel(base, "id", "vec", k = 6,
      coarseIters = 2, fineIters = 2)
    val b = KMeans.fitTwoLevel(
      base.repartition(11).sortWithinPartitions(
        org.apache.spark.sql.functions.col("id").desc),
      "id", "vec", k = 6, coarseIters = 2, fineIters = 2)
    val ra = a.assignments.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val rb = b.assignments.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(ra == rb, "dominant-cell assignment must be partitioning-invariant")
    assert(ra.size == 100, "every row assigned exactly once")
    val cents = a.centroids.collect().map(_.getLong(0)).sorted.toSeq
    assert(cents == cents.indices.map(_.toLong), "contiguous cent_ids")
    assert(cents.size == 6, "Hamilton seats total k (no cap binds: the " +
      "dominant cell has 95 members, outlier cells at least 1)")
    val domClusters = ra.filter(_._1 < 95L).map(_._2).toSet
    val outClusters = ra.filter(_._1 >= 95L).map(_._2).toSet
    assert(domClusters.intersect(outClusters).isEmpty,
      s"cluster spans the 100-apart groups: $domClusters vs $outClusters")
  }

  test("fitTwoLevel fails loudly when the fine-update budget is breached") {
    import spark.implicits._
    // same construction as the fitQuantized guard test: |xq| ~ 1e16
    // > 2^53/n while sums and distances stay inside int64 — but here
    // the guard is IN-PLAN (raise_error), since the fine update frame
    // is k-proportional and never reaches the driver
    val big = (0L until 60L).map(id => (id, Array.fill(2)(1e12f)))
      .toDF("id", "vec")
    val ex = intercept[Exception] {
      KMeans.fitTwoLevel(big, "id", "vec", k = 4,
        coarseIters = 0, fineIters = 1).assignments.count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("budget breached")),
      s"expected the budget guard, got: ${ex.getMessage}")
  }

  test("integer division truncates toward zero on negatives in BOTH " +
    "engines (the q233 negative-silhouette contract)") {
    // DuckDB's `//` truncates (-7 // 2 = -3, pinned by the gate the day
    // a negative permille first appears); Spark's `div` must agree.
    val r = spark.sql("SELECT -7 div 2 AS t, 7 div -2 AS u").head()
    assert(r.getLong(0) == -3L && r.getLong(1) == -3L)
  }

  test("fitQuantized fails loudly when the quantization budget is breached") {
    // The sneaky failure mode is NOT int64 overflow (ANSI makes that
    // loud on its own): it's a per-(cluster,dim) sum that FITS int64
    // but exceeds 2^53, where floor(sum/count) through a double can be
    // off by one and engines silently train different codebooks.
    // Vectors at ~1e12 with scale=1e4 give |xq| ~ 1e16 (> 2^53/n) while
    // every distance and sum stays comfortably inside int64.
    import spark.implicits._
    val big = (0L until 60L).map(id => (id, Array.fill(2)(1e12f)))
      .toDF("id", "vec")
    val ex = intercept[Exception] {
      KMeans.fitQuantized(big, "id", "vec", k = 3, iters = 1)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("budget breached")),
      s"expected the budget guard, got: ${ex.getMessage}")
  }
}
