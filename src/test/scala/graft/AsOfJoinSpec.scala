package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** The custom as-of join operator (logical node + strategy + physical
  * merge) must agree row-for-row with the declarative window-composed
  * formulation, null-pad left rows with no match, and plan as one
  * co-partitioned merge (no range-join explosion).
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"

  private def purchasesAndClicks() = {
    val ev = graft.Tables.table(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
    (purchases, clicks)
  }

  test("custom operator equals the window-composed as-of join") {
    val (purchases, clicks) = purchasesAndClicks()

    val native = AsOf.join(purchases, clicks,
        "user_id", "c_user", "p_ts", "c_ts")
      .select(col("user_id"), col("p_id"), col("c_id"), col("c_ts"))

    // declarative twin: union the streams, carry the last click forward
    // inside each user's timeline, keep purchase rows. Clicks at the
    // SAME ts as a purchase must sort BEFORE it (the operator's match
    // is inclusive: rt <= lt), hence the click-first tiebreak — sorting
    // by event_id alone would exclude a same-ts click with a higher id.
    val ev = graft.Tables.table(spark, sfDir, "events")
      .filter(col("event_type").isin("purchase", "click"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"),
        when(col("event_type") === "click", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = ev
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")), true).over(w))
      .withColumn("click_ts",
        last(when(col("event_type") === "click", col("ts")), true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("click_id").as("c_id"), col("click_ts").as("c_ts"))

    assert(native.count() == composed.count())
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty,
      "native as-of join diverges from the window composition")
    // and matches must actually exist (non-degenerate corpus)
    assert(native.filter(col("c_id").isNotNull).count() > 0)
  }

  test("left rows with no prior right row are null-padded") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("k", "t")
      .select(col("k"), timestamp_micros(col("t")).as("t"))
    val right = Seq((1L, 150L), (3L, 10L)).toDF("k2", "t2")
      .select(col("k2"), timestamp_micros(col("t2")).as("t2"))
    val out = AsOf.join(left, right, "k", "k2", "t", "t2")
      .orderBy(col("k"), col("t")).collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(2), "t=100 precedes the first right row")
    assert(!out(1).isNullAt(2) && out(1).getLong(2) == 1L, "t=200 matches t2=150")
    assert(out(2).isNullAt(2), "key 2 has no right rows")
  }

  test("ties on the right pick the newest row at-or-before the left ts") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
      .select(col("k"), timestamp_micros(col("t")).as("t"))
    val right = Seq((1L, 40L, "old"), (1L, 100L, "exact"), (1L, 101L, "future"))
      .toDF("k2", "t2", "tag")
      .select(col("k2"), timestamp_micros(col("t2")).as("t2"), col("tag"))
    val out = AsOf.join(left, right, "k", "k2", "t", "t2")
      .select(col("tag")).head()
    assert(out.getString(0) == "exact", "ts <= boundary must be inclusive")
  }

  test("strictUnique raises on influential duplicate right (key, ts) rows") {
    import spark.implicits._
    val left = Seq((1L, 200L)).toDF("k", "t")
      .select(col("k"), timestamp_micros(col("t")).as("t"))
    val right = Seq((1L, 100L, "a"), (1L, 100L, "b"))
      .toDF("k2", "t2", "tag")
      .select(col("k2"), timestamp_micros(col("t2")).as("t2"), col("tag"))
    // default: deterministic max-remaining-columns tie-break
    val lax = AsOf.join(left, right, "k", "k2", "t", "t2")
      .select(col("tag")).head()
    assert(lax.getString(0) == "b")
    // strict: the duplicate is consumed while matching -> loud error
    val e = intercept[Exception] {
      AsOf.join(left, right, "k", "k2", "t", "t2", strictUnique = true)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate (key=1, ts=100")),
      s"unexpected error: $e")
    // strict with a unique right side stays silent
    val uniq = Seq((1L, 100L, "only")).toDF("k2", "t2", "tag")
      .select(col("k2"), timestamp_micros(col("t2")).as("t2"), col("tag"))
    val ok = AsOf.join(left, uniq, "k", "k2", "t", "t2", strictUnique = true)
      .select(col("tag")).head()
    assert(ok.getString(0) == "only")
  }

  test("left-only filters push below the as-of join into the scan") {
    val (purchases, clicks) = purchasesAndClicks()
    val filtered = AsOf.join(purchases, clicks,
        "user_id", "c_user", "p_ts", "c_ts")
      .filter(col("user_id") > 100L) // left-side-only predicate
    val plan = filtered.queryExecution.executedPlan.toString
    // the injected AsOfJoinFilterPushdown rule must carry the predicate
    // into the LEFT (purchase) scan's pushed filters
    assert(plan.contains("GreaterThan(user_id,100)"),
      s"left filter did not reach PushedFilters:\n$plan")
    // and correctness: identical to pre-filtering the left input
    val preFiltered = AsOf.join(
      purchases.filter(col("user_id") > 100L), clicks,
      "user_id", "c_user", "p_ts", "c_ts")
    assert(filtered.exceptAll(preFiltered).isEmpty &&
      preFiltered.exceptAll(filtered).isEmpty)
  }

  test("right-side filters do NOT push (they would change the match)") {
    val (purchases, clicks) = purchasesAndClicks()
    val filtered = AsOf.join(purchases, clicks,
        "user_id", "c_user", "p_ts", "c_ts")
      .filter(col("c_id").isNotNull) // references the right side
    val optimized = filtered.queryExecution.optimizedPlan.toString
    // the Filter must remain ABOVE the AsOfJoin node
    val filterIdx = optimized.indexOf("Filter")
    val joinIdx = optimized.indexOf("AsOfJoin")
    assert(filterIdx >= 0 && joinIdx >= 0 && filterIdx < joinIdx,
      s"right-side filter must stay above the join:\n$optimized")
  }

  test("self-join with shared lineage projects the RIGHT side's values") {
    import spark.implicits._
    // Both sides derive from the SAME DataFrame and the right columns are
    // NOT re-aliased — before the exprId-overlap guard the duplicated
    // right columns silently projected the LEFT row's values.
    val base = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0))
      .toDF("k", "t", "v")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("v"))
    val left = base.filter(col("t") === timestamp_micros(lit(300L)))
    val right = base.filter(col("t") < timestamp_micros(lit(300L)))
    val out = AsOf.join(left, right, "k", "k", "t", "t").head()
    // output: (k, t, v) left ++ (k, t, v) right
    assert(out.getDouble(2) == 30.0, "left v")
    assert(out.getTimestamp(4).compareTo(out.getTimestamp(1)) < 0,
      s"right t must be the matched (earlier) row, not a copy of left t: $out")
    assert(out.getDouble(5) == 20.0,
      s"right v must come from the matched right row (t=200), got $out")
  }

  test("pushdown stops at the first nondeterministic conjunct") {
    val (purchases, clicks) = purchasesAndClicks()
    val joined = AsOf.join(purchases, clicks,
      "user_id", "c_user", "p_ts", "c_ts")
    // nondet() AND left_pred: the left predicate sits AFTER the
    // nondeterministic conjunct, so pushing it would change the row set
    // the nondeterministic predicate evaluates over. It must stay put.
    val blocked = joined.filter(rand(7) >= 0.0 && col("user_id") > 100L)
    val opt = blocked.queryExecution.optimizedPlan
    val joinNode = opt.collectFirst { case j: graft.plans.AsOfJoin => j }.get
    assert(!joinNode.left.toString.contains("user_id > 100"),
      s"left predicate after a nondet conjunct must NOT push:\n$opt")
    // deterministic PREFIX before the nondet conjunct still pushes
    val pushed = joined.filter(col("user_id") > 100L && rand(7) >= 0.0)
    val opt2 = pushed.queryExecution.optimizedPlan
    val joinNode2 = opt2.collectFirst { case j: graft.plans.AsOfJoin => j }.get
    assert(joinNode2.left.toString.contains("user_id"),
      s"deterministic prefix must still push below the join:\n$opt2")
  }

  test("plans as one co-partitioned merge: AsOfJoinExec, no BNLJ/cartesian") {
    val (purchases, clicks) = purchasesAndClicks()
    val df = AsOf.join(purchases, clicks,
      "user_id", "c_user", "p_ts", "c_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // exec prints without "Exec"
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"as-of must not plan a range-join explosion:\n$plan")
    // both children shuffled on the key, sorted by (key, ts)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }
}
