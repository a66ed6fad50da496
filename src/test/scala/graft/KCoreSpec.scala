package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** q201's bounded k-core peel: hand graphs where the 2-core is known in
  * closed form, the cascade property (each peel round can expose new
  * peelable nodes), the early-exit claim (the loop stops at fixpoint,
  * not at the round bound), the convergence witness (an UNCONVERGED
  * peel fails loudly instead of silently reporting pendant nodes as
  * core members — both engines would agree on the bounded-but-wrong
  * answer, so the hash gate can't catch it), and the fixpoint claim the
  * unrolled oracle rests on (running MORE rounds than
  * [[Dedup.KCorePeelRounds]] changes nothing on the gated corpus).
  */
class KCoreSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private def edgeDf(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("doc_a", "doc_b")
  }

  private def coreMap(pairs: Seq[(Long, Long)], rounds: Int = Dedup.KCorePeelRounds) =
    Dedup.kCore(edgeDf(pairs), Dedup.KCoreK, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle survives the 2-core; a pendant chain peels away; the loop early-exits at fixpoint") {
    // triangle {1,2,3} + chain 3-4-5: 5 peels first (deg 1), then 4 —
    // TWO rounds are needed (the cascade a single-pass degree filter
    // would miss), leaving the pure triangle at degree 2 each; round 3
    // witnesses the fixpoint, so only 3 of the 8 budgeted rounds run
    val (coreDf, used) = Dedup.kCoreWithRounds(
      edgeDf(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))),
      Dedup.KCoreK, Dedup.KCorePeelRounds)
    val core = coreDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(used == 3, s"expected early exit at round 3, ran $used")
  }

  test("isolated dup pairs (the LSH-graph common case) peel to an empty core") {
    val core = coreMap(Seq((1L, 2L), (3L, 4L), (5L, 6L)))
    assert(core.isEmpty)
  }

  test("a peel that cannot reach fixpoint within the bound fails loudly (convergence witness)") {
    // path 0-1-2-...-20: each round peels both ends; 8 rounds would
    // leave 5 middle nodes standing even though the true 2-core is
    // empty — the bounded-but-wrong answer both engines would AGREE on.
    // The witness turns that silent misreport into an error; a longer
    // budget peels the path to its (empty) fixpoint.
    val path = (0L until 20L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] { coreMap(path) }
    assert(e.getMessage.contains("fixpoint"))
    assert(coreMap(path, rounds = 12).isEmpty) // 10 peel rounds + witness
  }

  test("fixpoint by the round bound on every gated corpus (sf0.001, sf0.01, sf0.1)") {
    // the unrolled oracle computes the same bounded-round result by
    // construction, so an UNCONVERGED peel would pass the hash gate
    // while reporting non-core nodes — convergence must be pinned on
    // the corpora the gate actually runs, not just the smallest
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val edges = Dedup.candidatePairs(spark, s"/root/testdata/$sf")
        .select("doc_a", "doc_b").localCheckpoint()
      val atBound = Dedup.kCore(edges, Dedup.KCoreK, Dedup.KCorePeelRounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val beyond = Dedup.kCore(edges, Dedup.KCoreK, Dedup.KCorePeelRounds + 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(atBound == beyond, s"peel had not converged by the round bound at $sf")
    }
  }
}
