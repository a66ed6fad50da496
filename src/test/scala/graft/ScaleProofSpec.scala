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

  test("bucketed tables join with ZERO exchanges (co-located join)") {
    // The 100 TB co-location story: both sides written bucketed+sorted
    // on the join key join with no shuffle at all — at scale this turns
    // the nightly fact⋈fact join from a full-network event into a
    // file-local merge. (Bucket files are also pre-sorted, so the SMJ's
    // per-partition sort is satisfied by the layout.)
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    spark.sql("DROP TABLE IF EXISTS bkt_orders_sp")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem_sp")
    try {
      orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bkt_orders_sp")
      lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bkt_lineitem_sp")

      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("bkt_orders_sp")
          .join(spark.table("bkt_lineitem_sp"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        assert(joined.queryExecution.toRdd.count() > 0)
        val plan = joined.queryExecution.executedPlan.toString
        val joinIdx = plan.indexOf("SortMergeJoin")
        assert(joinIdx >= 0, s"expected a sort-merge join:\n${plan.take(3000)}")
        // no Exchange anywhere below the join: both scans satisfy the
        // hash-clustered requirement straight from the bucket layout,
        // and the groupBy on the same key reuses it too
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n${plan.take(4000)}")

        // and the result matches the plain (shuffling) join
        val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty,
          "bucketed join result diverges from plain join")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders_sp")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem_sp")
    }
  }
}
