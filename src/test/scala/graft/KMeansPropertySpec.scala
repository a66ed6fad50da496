package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeans

/** Property suite for the exact-int64 Lloyd trainer
  * (ops/KMeans.fitQuantized) — after ConnectedComponents the next
  * highest blast-radius custom op: the IVF family (q24/q94/q211/q224)
  * and, by contract ("matches fitQuantized per subspace exactly"), the
  * PQ trainer behind q158/q159 all assume its determinism rules. The
  * example specs pin separable blobs; here every random draw must agree
  * bit-for-bit — codebook AND assignments — with a single-threaded
  * driver-side model, on the shapes the blob fixture can never produce:
  *
  *   - exact distance TIES (values drawn from a small pool, so distinct
  *     centroids sit equidistant from a point — the tie must break
  *     toward the lower cent_id on both sides);
  *   - duplicate vectors (several ids quantizing to the same xq,
  *     including duplicates of the seed vectors — seed ranking is by
  *     id, not by value);
  *   - EMPTIED clusters (k close to n plus duplicate-heavy pools starve
  *     seeds; an emptied cluster must keep its previous centroid, not
  *     reset or vanish);
  *   - iters = 0 (the degenerate "assign against the raw seeds" call);
  *   - negative components and asymmetric magnitudes (floor quantization
  *     of negative doubles rounds AWAY from zero — a truncation-vs-floor
  *     fork between engine and model surfaces here instantly);
  *   - adversarial partitioning (every draw re-runs under a shuffled
  *     repartition and must produce the identical result — the
  *     order-independence claim the scaladoc makes).
  */
class KMeansPropertySpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private val Scale = 10000L

  /** Driver-side exact-integer Lloyd — independent single-threaded
    * reimplementation of the documented contract (quantize → k-lowest-id
    * seeds → (dist, cent_id) min assignment → floor(sum/count) update →
    * empty keeps old → final assignment).
    */
  private def model(
      rows: Seq[(Long, Array[Float])],
      k: Int,
      iters: Int): (Array[(Int, Array[Long])], Seq[(Long, Int)]) = {
    val q = rows.sortBy(_._1)
      .map { case (id, v) =>
        (id, v.map(x => math.floor(x.toDouble * Scale).toLong))
      }
    val dim = q.head._2.length
    var cents = q.take(k).zipWithIndex
      .map { case ((_, v), i) => (i, v.clone()) }.toArray

    def assign(): Seq[(Long, Array[Long], Int)] = q.map { case (id, x) =>
      val best = cents.map { case (c, ce) =>
        (x.zip(ce).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.min // (dist, cent_id) lexicographic — ties toward lower cent_id
      (id, x, best._2)
    }

    for (_ <- 1 to iters) {
      val asg = assign()
      cents = cents.map { case (c, old) =>
        val members = asg.filter(_._3 == c).map(_._2)
        if (members.isEmpty) (c, old)
        else (c, Array.tabulate(dim)(d =>
          math.floor(members.map(_(d)).sum.toDouble / members.length).toLong))
      }
    }
    (cents, assign().map(t => (t._1, t._3)))
  }

  // --- generators -------------------------------------------------------

  /** Small value pool → repeated values across vectors and dimensions,
    * forcing exact-tie and duplicate-vector regimes; the occasional
    * ±97.25 keeps magnitudes asymmetric without nearing the budget.
    */
  private val compGen: Gen[Float] = Gen.frequency(
    6 -> Gen.oneOf(-2.5f, -1.0f, -0.1f, 0f, 0.1f, 0.5f, 1.0f, 2.5f),
    1 -> Gen.oneOf(-97.25f, 97.25f))

  private case class Case(
      rows: List[(Long, Array[Float])], k: Int, iters: Int)

  private val caseGen: Gen[Case] = for {
    dim <- Gen.choose(1, 4)
    n <- Gen.choose(3, 28)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim, compGen).map(_.toArray))
    // sparse non-contiguous ids — seed selection must rank by id value
    ids <- Gen.listOfN(n, Gen.choose(0L, 400L)).map(_.distinct)
      .retryUntil(_.sizeIs >= 3)
    k <- Gen.choose(1, math.min(6, ids.size))
    iters <- Gen.choose(0, 3)
  } yield Case(ids.zip(vecs).toList, k, iters)

  /** Deterministic sampler (the AsOfJoin/CC property-spec pattern;
    * draws are modest — each runs iters+2 rounds of Spark jobs twice).
    */
  private def forAll[A](gen: Gen[A], draws: Int)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(20260815L)
    var produced = 0
    while (produced < draws) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
    }
  }

  test("fitQuantized == driver-side exact-integer Lloyd on random " +
    "tie/duplicate/empty-cluster cases, under adversarial partitioning") {
    import spark.implicits._
    forAll(caseGen, 10) { case Case(rows, k, iters) =>
      val (expCents, expAsg) = model(rows, k, iters)
      val df = rows.toDF("id", "vec")

      // natural partitioning AND a shuffled repartition must both match
      // the model exactly (codebook + assignments)
      for (input <- Seq(df,
          df.repartition(7).sortWithinPartitions(col("id").desc))) {
        val r = KMeans.fitQuantized(input, "id", "vec", k = k, iters = iters)
        assert(r.centroids.map { case (c, v) => (c, v.toSeq) }.toSeq ==
          expCents.map { case (c, v) => (c, v.toSeq) }.toSeq,
          s"codebook fork (n=${rows.size} k=$k iters=$iters)")
        val got = r.assignments.collect()
          .map(row => (row.getLong(0), row.getInt(1))).sortBy(_._1).toSeq
        assert(got == expAsg.sortBy(_._1),
          s"assignment fork (n=${rows.size} k=$k iters=$iters)")
        // structural postcondition: cluster ids stay in [0, k)
        assert(got.forall { case (_, c) => c >= 0 && c < k })
      }
    }
  }

  /** Driver-side reference of [[KMeans.fitTwoLevel]]'s documented
    * contract: flat Lloyd at kc = ⌈√k⌉ coarse cells, Hamilton
    * largest-remainder fine-seat allocation (base 1 per non-empty cell,
    * remainder ties → lower cell id, capped at the cell size), per-cell
    * fine Lloyd seeded by the kf lowest ids, cluster = cell offset +
    * fine. The fine stage reuses the SAME single-threaded Lloyd as
    * [[model]] restricted to each cell's members — which is exactly the
    * equivalence the distributed trainer (and its oracle CTE chain)
    * claims.
    */
  private def modelTwoLevel(
      rows: Seq[(Long, Array[Float])],
      k: Int,
      coarseIters: Int,
      fineIters: Int): (Seq[(Long, Long)], Seq[(Long, Seq[Long])]) = {
    val q = rows.sortBy(_._1)
      .map { case (id, v) =>
        (id, v.map(x => math.floor(x.toDouble * Scale).toLong))
      }
    val dim = q.head._2.length

    def lloyd(pts: Seq[(Long, Array[Long])], kk: Int, iters: Int)
        : (Array[(Int, Array[Long])], Seq[(Long, Int)]) = {
      var cents = pts.take(kk).zipWithIndex
        .map { case ((_, v), i) => (i, v.clone()) }.toArray
      def assign() = pts.map { case (id, x) =>
        val best = cents.map { case (c, ce) =>
          (x.zip(ce).map { case (a, b) => (a - b) * (a - b) }.sum, c)
        }.min
        (id, x, best._2)
      }
      for (_ <- 1 to iters) {
        val asg = assign()
        cents = cents.map { case (c, old) =>
          val m = asg.filter(_._3 == c).map(_._2)
          if (m.isEmpty) (c, old)
          else (c, Array.tabulate(dim)(d =>
            math.floor(m.map(_(d)).sum.toDouble / m.length).toLong))
        }
      }
      (cents, assign().map(t => (t._1, t._3)))
    }

    val kc = KMeans.ceilSqrt(k.toLong)
    val (_, coarse) = lloyd(q, kc, coarseIters)
    val cells = coarse.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val cellIds = cells.keys.toSeq.sorted
    val n = q.size.toLong
    val rem = k.toLong - cellIds.size
    val fl = cellIds.map(c => c -> rem * cells(c).size / n).toMap
    val md = cellIds.map(c => c -> rem * cells(c).size % n).toMap
    val leftover = (rem - fl.values.sum).toInt
    val extra = cellIds.sortBy(c => (-md(c), c)).take(leftover).toSet
    val kf = cellIds.map(c => c -> math.min(cells(c).size.toLong,
      1L + fl(c) + (if (extra(c)) 1L else 0L))).toMap
    val offMap = cellIds.zip(
      cellIds.scanLeft(0L)((acc, c) => acc + kf(c))).toMap
    val byId = q.toMap
    val perCell = cellIds.map { c =>
      val members = cells(c).map(id => (id, byId(id)))
      val (fCents, fAsg) = lloyd(members, kf(c).toInt, fineIters)
      (fAsg.map { case (id, fine) => (id, offMap(c) + fine) },
        fCents.map { case (fine, v) => (offMap(c) + fine, v.toSeq) }.toSeq)
    }
    (perCell.flatMap(_._1).sortBy(_._1), perCell.flatMap(_._2).sortBy(_._1))
  }

  private val tlCaseGen: Gen[Case] = for {
    dim <- Gen.choose(1, 4)
    n <- Gen.choose(6, 34)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim, compGen).map(_.toArray))
    ids <- Gen.listOfN(n, Gen.choose(0L, 400L)).map(_.distinct)
      .retryUntil(_.sizeIs >= 6)
    // k up past n/2 forces cap-bound cells (kf > cell size) and
    // empty-fine-centroid regimes; small k forces rem = 0
    k <- Gen.choose(2, math.min(12, ids.size))
    iters <- Gen.choose(0, 2)
  } yield Case(ids.zip(vecs).toList, k, iters)

  test("fitTwoLevel == driver-side two-level reference (coarse Lloyd + " +
    "Hamilton seats + per-cell fine Lloyd), under adversarial partitioning") {
    import spark.implicits._
    forAll(tlCaseGen, 8) { case Case(rows, k, iters) =>
      val (expAsg, expCents) = modelTwoLevel(rows, k, iters, iters)
      val df = rows.toDF("id", "vec")
      for (input <- Seq(df,
          df.repartition(7).sortWithinPartitions(col("id").desc))) {
        val r = KMeans.fitTwoLevel(input, "id", "vec", k = k,
          coarseIters = iters, fineIters = iters)
        val got = r.assignments.collect()
          .map(row => (row.getLong(0), row.getLong(1))).sortBy(_._1).toSeq
        assert(got == expAsg,
          s"assignment fork (n=${rows.size} k=$k iters=$iters)")
        val cents = r.centroids.collect()
          .map(row => (row.getLong(0), row.getSeq[Long](1).toSeq))
          .sortBy(_._1).toSeq
        assert(cents == expCents,
          s"codebook fork (n=${rows.size} k=$k iters=$iters)")
        // structural postconditions: contiguous global ids, every id
        // assigned exactly once, K ≤ k (== k unless a cap bound)
        assert(cents.map(_._1) == cents.indices.map(_.toLong))
        assert(cents.size <= k)
        assert(got.map(_._1) == rows.map(_._1).sorted)
        assert(got.forall { case (_, c) => c >= 0 && c < cents.size })
      }
    }
  }
}
