package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

/** Native IntSqDist expression: interpreted eval, codegen path, SQL
  * registration, and value-equality with the HOF composition it
  * replaced (every gated consumer — the k-means trainers, q211/q224/
  * q228/q233/q237 — rides VectorOps.intSqDist, so this equality is what
  * keeps their hashes unchanged across the swap).
  */
class IntSqDistSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def hofIntSqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, e) => acc + e)

  test("native int_sq_dist equals a hand-computed value") {
    import spark.implicits._
    val df = Seq((Array(3L, -2L, 10000L), Array(1L, 2L, -10000L)))
      .toDF("a", "b")
    val got = df.select(VectorOps.intSqDist($"a", $"b")).head.getLong(0)
    assert(got == 4L + 16L + 400000000L)
  }

  test("native int_sq_dist equals the HOF fold on real quantized data") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
      .select(col("vec_id"), VectorOps.quantize(col("embedding"), 10000L).as("q"))
    val pairs = emb.select(col("vec_id").as("i"), col("q").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("q").as("b")))
      .filter(col("i") < col("j")).limit(5000)
    val bad = pairs.select(
        VectorOps.intSqDist(col("a"), col("b")).as("n"),
        hofIntSqDist(col("a"), col("b")).as("h"))
      .filter(col("n") =!= col("h")).count()
    assert(bad == 0L, s"native vs HOF disagreed on $bad pairs")
  }

  test("int_sq_dist is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        VectorOps.quantize(col("embedding"), 10000L).as("q"))
      .createOrReplaceTempView("embq_sql")
    val n = spark.sql(
      """SELECT a.vec_id, int_sq_dist(a.q, b.q) AS d
        |FROM embq_sql a JOIN embq_sql b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 5 AND b.vec_id < 10 AND int_sq_dist(a.q, b.q) >= 0
        |""".stripMargin).count()
    assert(n > 0)
  }

  test("unequal-length vectors yield null, matching the HOF path") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    assert(df.select(VectorOps.intSqDist($"a", $"b")).head.isNullAt(0))
    assert(df.select(hofIntSqDist($"a", $"b")).head.isNullAt(0))
  }

  test("null ELEMENTS yield null, matching the HOF fold (both paths)") {
    // getLong on a null slot reads an undefined value — the expression
    // must return null like aggregate-over-zip_with did, not a garbage
    // distance (ADVICE r13). Checked interpreted AND codegen-only.
    import spark.implicits._
    val df = Seq(
        (Array[java.lang.Long](1L, null, 3L), Array[java.lang.Long](1L, 2L, 3L)),
        (Array[java.lang.Long](1L, 2L, 3L), Array[java.lang.Long](1L, 2L, null)),
        (Array[java.lang.Long](1L, 2L, 3L), Array[java.lang.Long](4L, 5L, 6L)))
      .toDF("a", "b")
    def run(): Seq[Option[Long]] = df.select(
        VectorOps.intSqDist($"a", $"b").as("n"), hofIntSqDist($"a", $"b").as("h"))
      .collect().flatMap(r => Seq(
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(run() == Seq(None, None, None, None, Some(27L), Some(27L)))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      assert(run() == Seq(None, None, None, None, Some(27L), Some(27L)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("strict-schema path under forced codegen (no fallback allowed)") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val rows = Seq((Array(5L, 5L), Array(2L, -1L)), (Array(0L, 0L), Array(0L, 0L)))
        .toDF("a", "b")
        .select(VectorOps.intSqDist($"a", $"b").as("d"))
        .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq
      assert(rows == Seq(45L, 0L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
