package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** Property suite for the alternating large-star/small-star connected
  * components (ops/ConnectedComponents.scala) — after AsOfJoin the
  * second-highest blast-radius custom code: six gated queries
  * (q78/q87/q156/q157/q212/q253 + the q260/q261 audits) consume its
  * labels through the Dedup memo. The example specs pin known shapes;
  * here every random draw must agree node-for-node with a driver-side
  * min-root union-find, on generators that force the regimes the gate
  * corpora never do: sparse ids across distant islands (including ids
  * at Long.MaxValue − ε, where a +1 anywhere would overflow),
  * chain/star/clique mixtures, duplicate + self-loop + both-orientation
  * noise, and the HOT-BUCKET-CAP EVICTION shape (a bucket of m docs
  * capped at c produces pairs only among the c survivors — evicted
  * members must come out UNLABELLED, exactly the contract q156's
  * coalesce-to-singleton join relies on).
  *
  * Per draw it also pins the operator's structural postconditions:
  * every label is the true component minimum (never just "a" stable
  * label — both engines agreeing on a wrong min would slip the hash
  * gate), labels ≤ ids, representatives map to themselves, and
  * runWithDropCount's checksum-derived count equals the labelled
  * non-representative count (the star-forest claim).
  */
class CCPropertySpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  /** Min-root union-find over arbitrary Long ids: pointing the larger
    * root at the smaller keeps every root the component MINIMUM.
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  // --- generators -------------------------------------------------------

  /** Ids from three distant islands so components span sparse ranges;
    * the third island hugs Long.MaxValue (an off-by-one/overflow in the
    * contraction arithmetic would surface here, not at ids 0..n).
    */
  private val idGen: Gen[Long] = Gen.frequency(
    5 -> Gen.choose(0L, 30L),
    2 -> Gen.choose(1000000L, 1000030L),
    1 -> Gen.choose(Long.MaxValue - 20L, Long.MaxValue - 1L))

  private val randomEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    es <- Gen.listOfN(n, Gen.zip(idGen, idGen))
  } yield es

  private val chainEdges: Gen[List[(Long, Long)]] = for {
    start <- Gen.oneOf(Gen.choose(0L, 40L),
      Gen.choose(Long.MaxValue - 60L, Long.MaxValue - 41L))
    len <- Gen.choose(1, 32)
  } yield (0 until len).map(i => (start + i, start + i + 1)).toList

  private val starEdges: Gen[List[(Long, Long)]] = for {
    hub <- idGen
    spokes <- Gen.listOf(idGen)
  } yield spokes.map(s => (hub, s))

  private val cliqueEdges: Gen[List[(Long, Long)]] = for {
    members <- Gen.listOfN(6, idGen).map(_.distinct)
  } yield (for {
    a <- members; b <- members if a < b
  } yield (a, b)).toList

  /** The Dedup.MaxBucketDocs eviction shape: a bucket of `members`
    * capped at `cap` pairs only its `cap` SMALLEST members (row_number
    * over doc_id asc) — the rest are evicted and must stay unlabelled.
    * Returns (edges, evicted).
    */
  private val cappedBucket: Gen[(List[(Long, Long)], Set[Long])] = for {
    members <- Gen.listOfN(10, idGen).map(_.distinct)
    cap <- Gen.choose(1, 6)
  } yield {
    val kept = members.sorted.take(cap)
    val edges = for (a <- kept; b <- kept if a < b) yield (a, b)
    (edges, members.toSet -- kept.toSet)
  }

  /** 1–3 topology fragments + duplicate/flip/self-loop noise. */
  private val caseGen: Gen[(List[(Long, Long)], Set[Long])] = for {
    frags <- Gen.choose(1, 3)
    parts <- Gen.listOfN(frags,
      Gen.oneOf(randomEdges, chainEdges, starEdges, cliqueEdges))
    bucket <- cappedBucket
    selfLoops <- Gen.listOf(idGen).map(_.map(i => (i, i)))
  } yield {
    val base = parts.flatten ++ bucket._1 ++ selfLoops
    // noise: every edge again flipped, plus a literal duplicate prefix
    val noisy = base ++ base.map(_.swap) ++ base.take(3)
    // evicted members may still be touched by another fragment — the
    // "must stay unlabelled" set is only what NO edge reaches
    val touched = noisy.flatMap(e => Seq(e._1, e._2)).toSet
    (noisy, bucket._2 -- touched)
  }

  /** Deterministic sampler (the AsOfJoinPropertySpec pattern; draws are
    * modest — each runs a full contraction loop of Spark jobs).
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

  test("labels == min-root union-find on adversarial random graphs; " +
    "star-forest postconditions hold; evicted nodes stay unlabelled") {
    import spark.implicits._
    forAll(caseGen, 12) { case (edges, neverTouched) =>
      val df = edges.toDF("src", "dst")
      val (labels, dropped) = ConnectedComponents.runWithDropCount(df)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // exact agreement with the model, including the min-label claim
      val expected = unionFind(edges)
      assert(got.keySet == expected.keySet,
        s"node set: got ${got.keySet.size}, expected ${expected.keySet.size}")
      got.foreach { case (id, label) =>
        assert(label == expected(id), s"node $id: $label != ${expected(id)}")
      }

      // structural postconditions
      got.foreach { case (id, label) =>
        assert(label <= id, s"label $label > id $id")
        assert(got.getOrElse(label, -1L) == label,
          s"representative $label of $id does not map to itself")
      }
      assert(dropped == got.count { case (id, l) => id != l },
        "checksum drop count != labelled non-representatives")

      // the eviction contract: a capped-out bucket member no edge
      // reaches is ABSENT from the labels (consumers singleton it)
      neverTouched.foreach { id =>
        assert(!got.contains(id), s"evicted node $id was labelled")
      }
    }
  }
}
