package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** Property tests for the custom as-of physical operator (the repo's
  * highest-blast-radius code — plans/AsOfJoin.scala): on every random
  * draw the operator must agree row-for-row with BOTH an in-memory
  * first-principles model and the declarative window-composed twin
  * (the q36 ≡ q74 contract). Generators force the nasty regimes on
  * purpose: a tiny key space (guaranteed key collisions), a tiny
  * timestamp range (guaranteed exact left-ts = right-ts boundary ties,
  * which must match INCLUSIVELY), NULL payload values, keys present on
  * only one side, duplicate left rows, and empty either-side frames.
  * Right (key, ts) pairs are deduped by the generator — the lax
  * duplicate tie-break has its own example-based spec (AsOfJoinSpec).
  */
// file-level so Spark can encode it (inner classes need outer scopes)
case class AsOfEv(k: Long, t: Long, v: Option[Int])

class AsOfJoinPropertySpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private type Ev = AsOfEv
  private val Ev = AsOfEv

  private val rowGen: Gen[Ev] = for {
    k <- Gen.choose(1L, 4L)
    t <- Gen.choose(0L, 15L)
    v <- Gen.frequency(4 -> Gen.choose(0, 99).map(Some(_)),
      1 -> Gen.const(None))
  } yield Ev(k, t, v)

  private val caseGen: Gen[(List[Ev], List[Ev])] = for {
    nl <- Gen.frequency(1 -> Gen.const(0), 6 -> Gen.choose(1, 24))
    nr <- Gen.frequency(1 -> Gen.const(0), 6 -> Gen.choose(1, 24))
    left <- Gen.listOfN(nl, rowGen)
    right <- Gen.listOfN(nr, rowGen)
  } yield (left, right.groupBy(e => (e.k, e.t)).values.map(_.head).toList)

  /** Deterministic sampler (scalatestplus isn't on the offline
    * classpath; the GridPropertySpec pattern). Draw count is modest
    * because each draw runs three Spark jobs.
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

  /** First-principles model: per left row, the newest right row of the
    * same key with rt <= lt (inclusive), else nulls.
    */
  private def model(left: List[Ev], right: List[Ev]): Seq[(Long, Long,
      Option[Int], Option[Long], Option[Long], Option[Int])] =
    left.map { l =>
      val m = right.filter(r => r.k == l.k && r.t <= l.t)
        .sortBy(_.t).lastOption
      (l.k, l.t, l.v, m.map(_.k), m.map(_.t), m.flatMap(_.v))
    }

  private def canon(rows: Array[Row]): Seq[String] =
    rows.map(r => (0 until r.length).map(i =>
      if (r.isNullAt(i)) "_" else r.get(i).toString).mkString("|")).sorted

  test("operator ≡ in-memory model ≡ window twin on random draws " +
    "(collisions, boundary ties, nulls, empty sides)") {
    import spark.implicits._
    var sawTie = false; var sawEmpty = false; var sawUnmatched = false
    forAll(caseGen, 25) { case (l, r) =>
      val left = l.toDF("k", "t", "v")
      val right = r.toDF("k2", "t2", "v2")

      val native = canon(
        AsOf.join(left, right, "k", "k2", "t", "t2").collect())

      val expect = model(l, r).map { case (k, t, v, mk, mt, mv) =>
        Seq(Some(k), Some(t), v, mk, mt, mv)
          .map(_.fold("_")(_.toString)).mkString("|")
      }.sorted
      assert(native == expect,
        s"operator vs model diverged\nleft=$l\nright=$r\n" +
          s"native=$native\nmodel=$expect")

      // window-composed twin: union both streams, carry the last right
      // row forward (right rows sort BEFORE left at equal ts — the
      // inclusive rt <= lt boundary), keep left rows
      val ev = l.map(e => (e.k, e.t, e.v, 1, None: Option[Long],
          None: Option[Int]))
        .union(r.map(e => (e.k, e.t, None: Option[Int], 0, Some(e.t),
          e.v)))
        .toDF("k", "t", "v", "side", "rt", "rv")
      val w = Window.partitionBy(col("k"))
        .orderBy(col("t"), col("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the carried value is a STRUCT (non-null whenever a right row
      // exists) so a matched right row with a NULL payload is not
      // conflated with "no match" — last(ignoreNulls) on the bare
      // payload column would skip past it to an older non-null one
      val twin = canon(ev
        .withColumn("m", last(when(col("side") === 0,
          struct(col("rt"), col("rv"))), true).over(w))
        .filter(col("side") === 1)
        .select(col("k"), col("t"), col("v"),
          when(col("m").isNotNull, col("k")).as("k2"),
          col("m.rt").as("t2"), col("m.rv").as("v2"))
        .collect())
      assert(native == twin,
        s"operator vs window twin diverged\nleft=$l\nright=$r\n" +
          s"native=$native\ntwin=$twin")

      sawTie ||= l.exists(e => r.exists(x => x.k == e.k && x.t == e.t))
      sawEmpty ||= l.isEmpty || r.isEmpty
      sawUnmatched ||= model(l, r).exists(_._4.isEmpty)
    }
    // the generators must actually exercise the regimes they promise
    assert(sawTie, "no draw produced an exact boundary tie")
    assert(sawEmpty, "no draw produced an empty side")
    assert(sawUnmatched, "no draw produced an unmatched left row")
  }

  test("duplicate left rows each match independently") {
    import spark.implicits._
    val left = Seq((1L, 10L, Some(7)), (1L, 10L, Some(7)), (1L, 10L, None))
      .toDF("k", "t", "v")
    val right = Seq((1L, 5L, 42)).toDF("k2", "t2", "v2")
    val out = AsOf.join(left, right, "k", "k2", "t", "t2").collect()
    assert(out.length == 3)
    assert(out.forall(r => !r.isNullAt(5) && r.getInt(5) == 42))
  }
}
