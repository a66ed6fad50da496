package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the AQE skew-join path for q266 (VERDICT r15 item 3): the
  * automatic counterpart of q47's manual salting must actually FIRE —
  * `OptimizeSkewedJoin` splitting the hot reducer partitions at
  * runtime — not just produce correct rows with the machinery idle.
  *
  * The production thresholds (256 MB skewed-partition floor) are real
  * at 100 TB but unreachable at the local rung, so this spec scales
  * them to the sf0.01 corpus: threshold 16 KB, advisory 8 KB, factor
  * 1.0 (any partition above the median and the floor splits — q266's
  * routing puts ~80% of lineitem on three supplier keys, so the hot
  * partitions clear the median by construction). Output equality with
  * the un-skewed plan is certified by the DuckDB oracle gate
  * (q266_skew_join_aqe); this spec owns the PLAN shape: after
  * execution the final adaptive plan must carry SortMergeJoin
  * (skew=true) and a skewed AQEShuffleRead.
  */
class AqeSkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val dir = "/root/testdata/sf0.01"

  private val tuned = Map(
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192")

  /** The driver corpus is ONE parquet row group at this rung → one
    * shuffle mapper, and AQE's skew split partitions MAP-OUTPUT ranges
    * — with a single mapper there is structurally nothing to split. A
    * real table is many files/row groups, so the spec materializes the
    * same lineitem columns as an 8-file scratch copy and drives the
    * identical join body ([[graft.queries.Advanced.q266Body]]) over it.
    */
  private def scratchLineitem(): String = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_q266_skew_li"
    graft.Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .repartition(8)
      .write.mode("overwrite").parquet(path)
    path
  }

  test("q266: OptimizeSkewedJoin splits the hot-key partitions — " +
    "SortMergeJoin(skew=true) + skewed AQEShuffleRead in the final " +
    "adaptive plan") {
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = spark.read.parquet(scratchLineitem())
      val df = graft.queries.Advanced.q266Body(
        li, graft.Tables.table(spark, dir, "supplier"))
      df.collect() // AQE finalizes the plan only on execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the sort-merge join:\n$plan")
      assert(plan.contains("AQEShuffleRead"),
        s"expected runtime shuffle reads under AQE:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("q266 rows are identical with the skew machinery on and off — " +
    "the AQE split is a pure physical choice (local twin of the " +
    "DuckDB gate)") {
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val off = graft.queries.Advanced.q266(spark, dir).collect().toSeq
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val on = graft.queries.Advanced.q266(spark, dir).collect().toSeq
      assert(on == off, "skew-split output diverged from the plain join")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
