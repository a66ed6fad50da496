package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

/** Native CosineSimilarity expression: interpreted eval, codegen path,
  * SQL registration, and bit-equality with the HOF composition.
  */
class CosineSimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("native cosine equals hand-computed value") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(VectorOps.cosineNative($"a", $"b")).head.getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expected) < 1e-15)
  }

  test("native cosine is bit-identical to the HOF composition on real data") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
    val pairs = emb.select(col("vec_id").as("i"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("j"), col("embedding").as("b")))
      .filter(col("i") < col("j")).limit(5000)
    val diff = pairs.select(
        (VectorOps.cosineNative(col("a"), col("b")) -
          VectorOps.cosine(col("a"), col("b"))).as("d"))
      .agg(max(abs(col("d"))))
      .head.getDouble(0)
    assert(diff == 0.0, s"native vs HOF max abs diff: $diff")
  }

  test("cosine_sim is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |       cosine_sim(a.embedding, b.embedding) AS sim
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 5 AND b.vec_id < 10 AND
        |      cosine_sim(a.embedding, b.embedding) BETWEEN -1.0 AND 1.0
        |""".stripMargin).count()
    assert(n > 0)
  }

  test("unequal-length vectors yield null, matching the HOF path") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val row = df.select(
      VectorOps.cosineNative($"a", $"b").as("native"),
      VectorOps.cosine($"a", $"b").as("hof")).head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("codegen compiles with NON-nullable inputs; unequal lengths still null") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val at = ArrayType(FloatType, containsNull = false)
    val expr = graft.functions.CosineSimilarity(
      BoundReference(0, at, nullable = false),
      BoundReference(1, at, nullable = false))
    // The expression can emit null for unequal lengths even when both
    // children are strict, so it must declare itself nullable — otherwise
    // the generated `isNull = true` assignment targets a constant and
    // Janino rejects the stage (observed as a silent interpreter fallback).
    assert(expr.nullable)
    // generate() throws on Janino failure — no fallback can mask a bug here.
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val out = proj(InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f)),
      ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f))))
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(out.getDouble(0) - expected) < 1e-15)
    val uneq = proj(InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f)),
      ArrayData.toArrayData(Array(1.0f))))
    assert(uneq.isNullAt(0))
  }

  test("strict-schema DataFrame path under forced codegen (no fallback allowed)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = spark.range(100).select(
        array(lit(1.0f), col("id").cast("float")).as("a"),
        array(lit(2.0f), lit(3.0f)).as("b"))
      assert(!df.schema("a").nullable && !df.schema("b").nullable)
      val n = df.select(VectorOps.cosineNative(col("a"), col("b")).as("s"))
        .filter(col("s").isNotNull).count()
      assert(n == 100)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("self-similarity is 1 within fp tolerance for every vector") {
    val bad = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(VectorOps.cosineNative(col("embedding"), col("embedding")).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-12)
      .count()
    assert(bad == 0)
  }
}
