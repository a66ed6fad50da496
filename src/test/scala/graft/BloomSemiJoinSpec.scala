package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScaleOps

/** bloomSemiJoin must return EXACTLY the plain semi-join rows (the
  * bloom is a prefilter, the verify join removes false positives), and
  * the bloom prefilter alone must already drop most non-matching rows.
  */
class BloomSemiJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"

  test("returns exactly the plain semi-join result") {
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val hot = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 150000.0)
    val bloomed = ScaleOps.bloomSemiJoin(lineitem, hot, "l_orderkey", "o_orderkey")
      .agg(count(lit(1)), sum(col("l_orderkey")), countDistinct(col("l_orderkey")))
      .head()
    val plain = lineitem
      .join(hot.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)), sum(col("l_orderkey")), countDistinct(col("l_orderkey")))
      .head()
    assert(bloomed == plain)
    assert(bloomed.getLong(0) > 0)
  }

  test("empty build side yields an empty result, not a full scan") {
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val none = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 1e12)
    assert(ScaleOps.bloomSemiJoin(lineitem, none, "l_orderkey", "o_orderkey").isEmpty)
  }

  test("bloom prefilter ALONE is selective (drops most non-matching keys)") {
    import spark.implicits._
    // disjoint key spaces: build = [0, 1000), probe = [1000, 101000).
    // Measured BEFORE the verify join — every probe survivor here is a
    // bloom false positive, so this pins the fpp, not the exact result
    val small = spark.range(0, 1000).toDF("k")
    val big = spark.range(1000, 101000).toDF("k")
    val falsePositives =
      ScaleOps.bloomProbe(big, small, "k", "k", expectedItems = 1000).count()
    assert(falsePositives < 100000 / 20,
      s"bloom passed $falsePositives of 100000 non-matching keys (fpp > 5%)")
    // and the full operator still returns the exact (empty) semi-join
    assert(ScaleOps.bloomSemiJoin(big, small, "k", "k").count() == 0L)
  }
}
