package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScaleOps

/** Scale-technique operators: salted joins preserve semantics; bucketed
  * tables join without an Exchange (verified on the physical plan).
  */
class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ paths
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain-join rows under skew") {
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = lineitem.join(supplier, "l_suppkey")
      .agg(count(lit(1)), round(sum("l_quantity"), 2)).head
    val salted = ScaleOps.saltedJoin(lineitem, supplier, "l_suppkey", 8)
      .agg(count(lit(1)), round(sum("l_quantity"), 2)).head
    assert(plain == salted)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("bucketed-wh").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    ScaleOps.writeBucketed(orders.select(col("o_custkey"), col("o_totalprice")),
      "o_custkey", 4, "orders_bkt", s"$wh/orders_bkt")
    ScaleOps.writeBucketed(
      customer.select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      "o_custkey", 4, "cust_bkt", s"$wh/cust_bkt")
    val joined = spark.table("orders_bkt").join(spark.table("cust_bkt"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("q214's own plan is a SortMergeJoin with no exchange on either join key") {
    // Run under DEFAULT broadcast threshold in a fresh session state:
    // the MERGE hint (not this suite's -1 conf) must be what keeps the
    // join on the bucket-local sort-merge path.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val q = graft.queries.Advanced.q214(spark, sfDir)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"q214 must exercise the bucket layout via SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"q214's bucketed join must not shuffle either side:\n$plan")
      assert(q.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }
}
