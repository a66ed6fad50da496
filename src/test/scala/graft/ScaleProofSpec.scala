package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScaleOps

/** Plan- and layout-level proofs of the scale techniques beyond salting
  * and bucketing (ScaleOpsSpec): AQE splits skewed join partitions at
  * runtime, and range-partitioned writes produce disjoint sorted files
  * that a range predicate can prune.
  */
class ScaleProofSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // shrink AQE's skew thresholds so test-scale data exhibits the
    // behavior a 100 TB hot key would at the defaults
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits a pathologically skewed join partition (skew=true)") {
    import spark.implicits._
    // 90% of the fact rows share one key; dim has one row per key
    val fact = spark.range(200000L)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000)
          .as("k"),
        col("id").as("payload"))
    val dim = spark.range(1000L).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    val joined = fact.join(dim, "k")
    // execute THIS QueryExecution (count()/foreach() build separate
    // ones) so the AdaptiveSparkPlan below is the finalized runtime plan
    assert(joined.queryExecution.toRdd.count() > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the skewed partition:\n${plan.take(4000)}")
  }

  test("range-partitioned write yields disjoint, prunable sorted files") {
    val out = Files.createTempDirectory("range-layout").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    ScaleOps.writeRangePartitioned(orders, "o_orderkey", 4, out)

    // per-file key ranges must not overlap
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length >= 3, s"expected >=3 range files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"file ranges overlap: $hiA >= $loB")
      case _ =>
    }

    // a selective range predicate over the layout must prune most rows
    // at the scan (predicate reaches parquet as PushedFilters)
    val hi = ranges.head._2
    val q = spark.read.parquet(out).filter(col("o_orderkey") <= hi)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderkey), LessThanOrEqual(o_orderkey,"),
      s"range predicate did not push down:\n$scan")
    assert(q.count() > 0)
  }
}
