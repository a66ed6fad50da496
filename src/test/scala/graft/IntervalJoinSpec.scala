package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IntervalJoin

/** Bucketed interval-overlap join: exact parity with the naive theta
  * join (each pair exactly once), and the physical plan is an EQUI join
  * on the bucket — not the nested-loop plan the raw predicate forces.
  */
class IntervalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def intervals(prefix: String, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until 400).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, s, s + rnd.nextInt(50).toLong)
    }.toDF(s"${prefix}_id", s"${prefix}_s", s"${prefix}_e")
  }

  test("matches the naive theta join exactly, each pair once") {
    val a = intervals("a", 1)
    val b = intervals("b", 2)
    for (width <- Seq(7L, 64L, 5000L)) {
      val fast = IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", width)
        .select(col("a_id"), col("b_id"))
      val naive = a.join(b,
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select(col("a_id"), col("b_id"))
      val f = fast.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(f.length == f.distinct.length, s"width=$width emitted dups")
      assert(f.toSeq == n.toSeq, s"width=$width mismatch: ${f.length} vs ${n.length}")
    }
  }

  test("plans as an equi join on the bucket, not a nested loop") {
    val a = intervals("a", 3)
    val b = intervals("b", 4)
    val plan = IntervalJoin
      .overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 32L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in plan:\n$plan")
    val naivePlan = a.join(b,
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"),
      s"expected the raw predicate to nested-loop:\n$naivePlan")
  }

  test("inverted intervals fail loudly instead of silently dropping") {
    import spark.implicits._
    val bad = Seq((1L, 20L, 10L)).toDF("a_id", "a_s", "a_e")
    val ok = Seq((1L, 0L, 100L)).toDF("b_id", "b_s", "b_e")
    val ex = intercept[Exception] {
      IntervalJoin.overlapJoin(bad, ok, "a_s", "a_e", "b_s", "b_e", 8L).count()
    }
    assert(ex.getMessage.contains("overlapJoin") ||
      Option(ex.getCause).exists(_.getMessage.contains("overlapJoin")),
      s"unexpected error: ${ex.getMessage}")
  }

  test("auto width tracks the interval scale — no explode blowup on wide corpora") {
    import spark.implicits._
    // Same corpus shape at two time scales 1000x apart. A hard-coded
    // width tuned for the narrow regime would explode ~1000 bucket rows
    // per wide interval; the auto width must land near the p50 length
    // in BOTH regimes, keeping the explode factor O(1).
    def corpus(prefix: String, seed: Int, unit: Long) = {
      val rnd = new scala.util.Random(seed)
      (0 until 300).map { i =>
        val s = rnd.nextInt(2000).toLong * unit
        (i.toLong, s, s + (10 + rnd.nextInt(40)).toLong * unit)
      }.toDF(s"${prefix}_id", s"${prefix}_s", s"${prefix}_e")
    }
    for (unit <- Seq(1L, 1000L)) {
      val a = corpus("a", 5, unit)
      val b = corpus("b", 6, unit)
      val w = IntervalJoin.autoBucketWidth(a, b, "a_s", "a_e", "b_s", "b_e")
      // p50 length is in [10*unit, 50*unit]; width must follow the scale
      assert(w >= 10 * unit && w <= 50 * unit,
        s"unit=$unit: auto width $w not in the p50 range")
      val auto = IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e")
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val naive = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(auto.length == auto.distinct.length, s"unit=$unit emitted dups")
      assert(auto.toSeq == naive.toSeq, s"unit=$unit mismatch")
    }
    // degenerate inputs don't divide by zero / NPE
    val empty = Seq.empty[(Long, Long, Long)].toDF("a_id", "a_s", "a_e")
    assert(IntervalJoin.autoBucketWidth(
      empty, empty.toDF("b_id", "b_s", "b_e"), "a_s", "a_e", "b_s", "b_e") == 1L)
  }

  test("auto width's capped scan still lands the knob (O(sample), not O(corpus))") {
    import spark.implicits._
    // cap (64) far below the corpus (300 rows/side) forces the sampled
    // path; iid lengths mean the first-rows bias is immaterial and the
    // sampled p50 must land in the same decade as the exact one
    def corpus(prefix: String, seed: Int) = {
      val rnd = new scala.util.Random(seed)
      (0 until 300).map { i =>
        val s = rnd.nextInt(2000).toLong
        (i.toLong, s, s + (10 + rnd.nextInt(40)).toLong)
      }.toDF(s"${prefix}_id", s"${prefix}_s", s"${prefix}_e")
    }
    val a = corpus("a", 7)
    val b = corpus("b", 8)
    val exact = IntervalJoin.autoBucketWidth(a, b, "a_s", "a_e", "b_s", "b_e")
    val sampled = IntervalJoin.autoBucketWidth(
      a, b, "a_s", "a_e", "b_s", "b_e", sampleRows = 64)
    assert(sampled >= 10 && sampled <= 50,
      s"sampled width $sampled outside the length range")
    assert(exact >= 10 && exact <= 50, s"exact width $exact outside the range")
    // a sub-cap input is read in full: the sampled path IS the exact path
    assert(IntervalJoin.autoBucketWidth(a, b, "a_s", "a_e", "b_s", "b_e",
      sampleRows = 10000) == exact)
  }

  test("auto width reads O(sample) rows, not the corpus (CollectLimit proof)") {
    // a per-row accumulator counts how many input rows the derivation
    // actually evaluates: head(cap) must stop after the first partition
    // or two of a 10M-row side, never scan it all
    val acc = spark.sparkContext.longAccumulator("rows_seen")
    val counted = org.apache.spark.sql.functions.udf { (s: Long) =>
      acc.add(1L); s
    }
    import spark.implicits._
    val big = spark.range(10_000_000L)
      .select(col("id").as("a_id"), counted(col("id")).as("a_s"),
        (counted(col("id")) + 5L).as("a_e"))
    val w = IntervalJoin.autoBucketWidth(
      big, big.toDF("b_id", "b_s", "b_e"), "a_s", "a_e", "b_s", "b_e")
    assert(w == 6L, s"constant-length intervals must derive width 6, got $w")
    assert(acc.value < 2_000_000L,
      s"autoBucketWidth evaluated ${acc.value} of 20M rows — the capped " +
        "scan is not short-circuiting")
  }

  test("point intervals and exact-touch boundaries") {
    import spark.implicits._
    val a = Seq((1L, 10L, 10L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((1L, 10L, 10L), (2L, 11L, 12L), (3L, 5L, 9L))
      .toDF("b_id", "b_s", "b_e")
    val got = IntervalJoin.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 4L)
      .select(col("b_id")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L)) // inclusive overlap: only the equal point
  }
}
