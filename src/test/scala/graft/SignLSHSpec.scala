package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SignLSH, VectorOps}

/** Sign-LSH bucketing: determinism, identical-vector collision, spread,
  * and the core LSH property — same-bucket pairs are more cosine-similar
  * than cross-bucket pairs on average.
  */
class SignLSHSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.01"

  private def bucketed = SignLSH.bucketize(
    spark.read.parquet(s"$sfDir/embeddings.parquet"), "embedding",
    nBits = 8, dims = 64)

  test("signatures are deterministic and identical vectors collide") {
    val a = bucketed.select(col("vec_id"), col("lsh_bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = bucketed.select(col("vec_id"), col("lsh_bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // a vector joined with itself must share its bucket
    val self = bucketed.as("x").join(bucketed.as("y"),
      col("x.vec_id") === col("y.vec_id"))
      .filter(col("x.lsh_bucket") =!= col("y.lsh_bucket")).count()
    assert(self == 0)
  }

  test("buckets spread the corpus (not a constant function)") {
    val n = bucketed.select(countDistinct(col("lsh_bucket"))).head.getLong(0)
    assert(n > 16, s"only $n distinct buckets over 500 vectors")
  }

  test("q42 is LSH-bucketed: no cartesian product, one row per sample vector") {
    val df = graft.queries.Similarity2.q42(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoop"),
      s"q42 must stay bucketed (equality joins only):\n$physical")
    val nSample = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") % 4 === 0).count()
    assert(df.count() == nSample,
      "q42 contract: exactly one output row per sample vector")
    // the LSH path must actually find neighbors for most vectors here —
    // an over-tight bucketing that NULLs everything would pass the two
    // asserts above while being useless
    val withNn = df.filter(col("nn_id").isNotNull).count()
    assert(withNn * 2 > nSample,
      s"only $withNn/$nSample sample vectors found an LSH candidate")
  }

  test("same-bucket pairs are more similar than cross-bucket pairs") {
    val b = bucketed.select(col("vec_id"), col("embedding"), col("lsh_bucket"))
    val pairs = b.as("x").join(b.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(
        (col("x.lsh_bucket") === col("y.lsh_bucket")).as("same_bucket"),
        VectorOps.cosineNative(col("x.embedding"), col("y.embedding"))
          .as("sim"))
    val stats = pairs.groupBy(col("same_bucket"))
      .agg(avg(col("sim")).as("avg_sim"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getBoolean(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val (sameAvg, sameN) = stats(true)
    val (diffAvg, _) = stats(false)
    assert(sameN > 0, "no same-bucket pairs at 8 bits over 500 vectors")
    assert(sameAvg > diffAvg + 0.05,
      s"LSH property violated: same=$sameAvg diff=$diffAvg")
  }
}
