package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression pins for defects found by plan audits — the
  * class of bug the correctness gate cannot see (output identical,
  * cost silently multiplied).
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val dir = "/root/testdata/sf0.001"

  test("q183: no parquet rescan in the consumer plan — the basket frame " +
    "is checkpointed once (VERDICT r14: toDF renames defeated " +
    "ReuseExchange and the plan scanned lineitem 4x / built baskets 3x)") {
    val df = graft.queries.Relational16.q183(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet") && !plan.contains("FileScan"),
      s"q183's consumer plan must read only checkpointed RDDs:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "expected the checkpointed basket/perPart scans in the plan")
    // the expensive ObjectHashAggregate (collect_set basket build) must
    // not appear in the consumer plan — it lives inside the one-time
    // checkpoint job
    assert(!plan.contains("collect_set"),
      s"basket aggregate rebuilt in the consumer plan:\n$plan")
  }

  test("q265: session merge is the native MergingSessions pass with ONE " +
    "pre-session exchange (no window-function fallback)") {
    val df = graft.queries.Events.q265(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MergingSessions"),
      s"expected the native session-window operator:\n$plan")
    assert(!plan.contains("Window"),
      s"q265 must not fall back to a window-function pass:\n$plan")
  }
}
