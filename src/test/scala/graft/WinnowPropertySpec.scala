package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.FingerprintOps

/** Seeded property tests for the winnowing MODEL on randomized token
  * streams (the model is pinned to the engine by FingerprintOpsSpec's
  * corpus test, so properties proven here transfer to q207/q210 and
  * StreamingWinnow):
  *
  *  - the MATCH GUARANTEE (Schleimer et al. 2003, theorem 1): any two
  *    documents sharing a passage of >= k+w-1 consecutive tokens share
  *    at least one selected fingerprint, wherever the passage sits;
  *  - selection soundness: every selected fingerprint is the hash of
  *    some k-gram of the document (no fabricated values);
  *  - density: selection never exceeds the gram count and never drops
  *    below the 1-per-window floor.
  */
class WinnowPropertySpec extends AnyFunSuite {

  private val K = FingerprintOps.WinnowK
  private val W = FingerprintOps.WinnowW

  private def winnow(toks: Seq[String]): Set[Long] = {
    val hashes = toks.sliding(K).map(w => ShingleModel.h60(w.mkString(" ")))
      .toVector
    hashes.sliding(W).map(_.min).toSet
  }

  private def gramSet(toks: Seq[String]): Set[Long] =
    toks.sliding(K).map(w => ShingleModel.h60(w.mkString(" "))).toSet

  private def forAll[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(4242L)
    var produced = 0
    while (produced < n) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
    }
  }

  // small vocabulary ON PURPOSE: repeated tokens create duplicate gram
  // hashes and tied window minima — the degenerate cases a winnow bug
  // hides in
  private val tokGen: Gen[String] = Gen.oneOf(
    (1 to 12).map(i => s"t$i"))

  private val caseGen: Gen[(List[String], List[String], List[String], List[String])] =
    for {
      passageLen <- Gen.choose(K + W - 1, 24)
      passage <- Gen.listOfN(passageLen, tokGen)
      pre1 <- Gen.listOfN(Gen.choose(0, 15).sample.getOrElse(5), tokGen)
      post1 <- Gen.listOfN(Gen.choose(0, 15).sample.getOrElse(5), tokGen)
      pre2 <- Gen.listOfN(Gen.choose(0, 15).sample.getOrElse(5), tokGen)
    } yield (passage, pre1, post1, pre2)

  test("match guarantee on random corpora with embedded shared passages") {
    forAll(caseGen) { case (passage, pre1, post1, pre2) =>
      val docA = pre1 ++ passage ++ post1
      val docB = pre2 ++ passage
      val shared = winnow(docA) & winnow(docB)
      assert(shared.nonEmpty,
        s"guarantee violated: passage=$passage pre1=$pre1 post1=$post1 pre2=$pre2")
    }
  }

  test("selection soundness and density bounds on random documents") {
    val docGen = Gen.choose(K + W - 1, 120)
      .flatMap(n => Gen.listOfN(n, tokGen))
    forAll(docGen) { toks =>
      val sel = winnow(toks)
      val grams = gramSet(toks)
      assert(sel.subsetOf(grams), "every selected value is a real gram hash")
      val nGrams = toks.length - K + 1
      // value-distinct selection: bounded above by the distinct gram
      // count, never empty (each full window contributes its min); no
      // sharper lower bound exists because a REPEATED gram hash (the
      // small vocabulary makes them) can be the min of arbitrarily many
      // far-apart windows
      assert(sel.nonEmpty && sel.size <= nGrams)
    }
  }
}
