package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression pins for defects found by plan audits — the
  * class of bug the correctness gate cannot see (output identical,
  * cost silently multiplied). The q183 incident (VERDICT r14: toDF
  * renames defeated ReuseExchange; the shipped plan scanned lineitem
  * 4x and rebuilt the basket aggregate 3x) defined the class; VERDICT
  * r15 item 2 extends the pin to EVERY localCheckpoint consumer whose
  * final plan must read materialized blocks instead of re-deriving the
  * corpus: each test below names the frame it pins and the number of
  * parquet scans the consumer plan is allowed (usually zero — the
  * corpus-scale work happened inside the one-time checkpoint job).
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val dir = "/root/testdata/sf0.001"

  /** All nodes of the executed plan, unwrapping AQE roots (AQE is on in
    * GraftSession, so the root is an AdaptiveSparkPlanExec LEAF — a
    * naive collect would see nothing and pass every assertion
    * trivially) and descending into subqueries.
    */
  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case other =>
        other +: (other.children.flatMap(flatten) ++
          other.subqueries.flatMap(flatten))
    }
    flatten(df.queryExecution.executedPlan)
  }

  private def className(p: SparkPlan): String = p.getClass.getSimpleName

  private def parquetScans(ns: Seq[SparkPlan]): Seq[SparkPlan] =
    ns.filter(n => className(n) == "FileSourceScanExec" ||
      className(n) == "BatchScanExec")

  private def rddScans(ns: Seq[SparkPlan]): Seq[SparkPlan] =
    ns.filter(n => className(n) == "RDDScanExec")

  /** Assert the consumer plan reads checkpointed blocks: exactly
    * `allowedParquet` file scans (the ones the consumer legitimately
    * joins back to the corpus) and at least one ExistingRDD scan.
    */
  private def pinCheckpointConsumer(name: String, df: DataFrame,
      allowedParquet: Int = 0, wantRdd: Boolean = true): Unit = {
    val ns = nodes(df)
    val pq = parquetScans(ns)
    assert(pq.size == allowedParquet,
      s"$name consumer plan has ${pq.size} file scans (allowed " +
        s"$allowedParquet) — a checkpointed frame is being re-derived " +
        s"from the corpus:\n${df.queryExecution.executedPlan}")
    if (wantRdd)
      assert(rddScans(ns).nonEmpty,
        s"$name: expected checkpointed ExistingRDD scans in the consumer " +
          s"plan:\n${df.queryExecution.executedPlan}")
  }

  test("q183: no parquet rescan in the consumer plan — the basket frame " +
    "is checkpointed once (VERDICT r14: toDF renames defeated " +
    "ReuseExchange and the plan scanned lineitem 4x / built baskets 3x)") {
    val df = graft.queries.Relational16.q183(spark, dir)
    pinCheckpointConsumer("q183 baskets/perPart", df)
    // the expensive ObjectHashAggregate (collect_set basket build) must
    // not appear in the consumer plan — it lives inside the one-time
    // checkpoint job
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_set"),
      s"basket aggregate rebuilt in the consumer plan:\n$plan")
  }

  test("q183 Persist seam: the fault-tolerant branch returns identical " +
    "rows through InMemoryTableScan at the same two plan points " +
    "(VERDICT r15 item 5)") {
    import graft.queries.Relational16
    val expected = Relational16.q183(spark, dir).collect().toSeq
    val df = Relational16.q183Basket(spark, dir, Relational16.Persist)
    try {
      val ns = nodes(df)
      assert(parquetScans(ns).isEmpty,
        s"Persist branch must also read materialized blocks, not " +
          s"re-scan lineitem:\n${df.queryExecution.executedPlan}")
      assert(ns.exists(n => className(n).startsWith("InMemoryTableScan")),
        s"expected the persisted baskets/perPart frames as " +
          s"InMemoryTableScan:\n${df.queryExecution.executedPlan}")
      assert(df.collect().toSeq == expected,
        "Persist branch diverged from the checkpoint default")
    } finally {
      // the CacheManager keys cached plans by LOGICAL plan: a leaked
      // persist here would silently serve cached baskets to every later
      // q183 call in this JVM (the exact hazard the default avoids)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("q78: CC labels are the memoized checkpoint — consumer plan " +
    "reads ExistingRDD, never re-runs banding/CC from documents") {
    pinCheckpointConsumer("q78 ccLabels",
      graft.queries.Dedup.q78(spark, dir))
  }

  test("q87: survivor stats join the corpus ONCE (the removeDropped " +
    "anti-join) — drop set comes from the CC checkpoint, not a rebuild") {
    pinCheckpointConsumer("q87 ccLabels+removeDropped",
      graft.queries.Dedup.q87(spark, dir), allowedParquet = 1)
  }

  test("q201: k-core consumer reads the peeled checkpoint — no corpus " +
    "rescan, no LSH rebuild in the final plan") {
    pinCheckpointConsumer("q201 kCore",
      graft.queries.Dedup.q201(spark, dir))
  }

  test("q206: HITS final join reads checkpointed nodes/hub/auth frames " +
    "— no per-round lineage replay, no documents rescan") {
    pinCheckpointConsumer("q206 HITS frames",
      graft.queries.GraphRank.q206(spark, dir))
  }

  test("q218: BPE merge table is driver-side (LocalTableScan) — the " +
    "training scans ran inside the memoized trainer, none in the plan") {
    val df = graft.queries.TokenizerOps.q218(spark, dir)
    val ns = nodes(df)
    assert(parquetScans(ns).isEmpty,
      s"q218 must not re-scan documents:\n${df.queryExecution.executedPlan}")
    assert(ns.exists(n => className(n).startsWith("LocalTableScan")),
      s"expected the merge table as LocalTableScan:\n" +
        s"${df.queryExecution.executedPlan}")
  }

  test("q220: encode chain consumer reads the per-round checkpointed " +
    "vocab frame — no documents rescan after the word-count pass") {
    pinCheckpointConsumer("q220 enc",
      graft.queries.TokenizerOps.q220(spark, dir))
  }

  test("q250: greedy MMR runs as ONE array-fold expression over the " +
    "pool/poolEmb checkpoints — zero parquet scans in the consumer " +
    "plan, deterministically (ADVICE r16 item 3: the old ≤4 gate " +
    "tolerated the planner's nondeterministic ReuseExchange; the " +
    "poolEmb join-back is checkpointed now, so reuse is structural)") {
    val df = graft.queries.RetrievalOps.q250(spark, dir)
    pinCheckpointConsumer("q250 pool/poolEmb", df)
    // the greedy rounds are an expression fold, not plan operators
    val ns = nodes(df)
    assert(!ns.exists(n => className(n).startsWith("Window")),
      s"q250: greedy rounds regressed to window operators:\n" +
        s"${df.queryExecution.executedPlan}")
  }

  test("q261: keep-policy windows read the scored checkpoint — no " +
    "documents rescan, no CC/quality rebuild in the consumer plan") {
    pinCheckpointConsumer("q261 scored",
      graft.queries.DedupAuditOps.q261(spark, dir))
  }

  test("q265: session merge is the native MergingSessions pass with ONE " +
    "pre-session exchange (no window-function fallback)") {
    val df = graft.queries.Events.q265(spark, dir)
    val ns = nodes(df)
    assert(ns.exists(n => className(n).contains("MergingSessions")),
      s"expected the native session-window operator:\n" +
        s"${df.queryExecution.executedPlan}")
    // operator-tree match, not a raw substring (ADVICE r15): an
    // attribute or unrelated node containing "Window" must not fail
    // this spuriously, and a renamed fallback must not slip past it
    val windowNodes = ns.filter(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(windowNodes.isEmpty,
      s"q265 must not fall back to a window-function pass:\n" +
        s"${df.queryExecution.executedPlan}")
  }
}
