package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CrossHash, H60}

/** The native [[H60]] expression must be bit-identical to the built-in
  * chain `conv(substr(md5(x), 1, 15), 16, 10)` it replaced in
  * [[CrossHash.h60]] — every oracle-gated fingerprint/sample/shingle
  * query depends on that equivalence.
  */
class H60Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Deterministic sampler (scalatestplus isn't on the offline
    * classpath; fixed seed chain, same coverage every run).
    */
  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(6060L)
    var produced = 0
    while (produced < n) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 80)
    chars <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.const(' '),
      1 -> Gen.oneOf('é', 'ü', '中', '文', 'あ'),
      1 -> Gen.oneOf('|', ':', '#')))
  } yield chars.mkString

  test("native h60 equals md5-hex parsing on random unicode strings") {
    forAll(textGen, 300) { s =>
      val viaDigest = H60.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val viaHex = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).substring(0, 15), 16)
      assert(viaDigest == viaHex, s"mismatch for '${s.take(40)}'")
    }
  }

  test("h60_array equals the transform-lambda formulation on the corpus") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("native", graft.functions.H60Array.h60Array(col("toks")))
      .withColumn("lambda", expr(
        "transform(toks, t -> cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint))"))
    assert(docs.filter(col("native") =!= col("lambda")).count() == 0)
    // null elements pass through as null, like transform
    import spark.implicits._
    val withNulls = Seq(Seq("a", null, "b")).toDF("arr")
      .withColumn("native", graft.functions.H60Array.h60Array(col("arr")))
      .selectExpr("native[1] IS NULL AS mid_null", "size(native) AS n")
      .head()
    assert(withNulls.getBoolean(0) && withNulls.getInt(1) == 3)
  }

  test("the Column API and the built-in chain agree on the real corpus") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("native", CrossHash.h60(col("text")))
      .withColumn("chain", conv(substring(md5(col("text")), 1, 15), 16, 10)
        .cast("long"))
    assert(docs.filter(col("native") =!= col("chain")).count() == 0)
    assert(docs.count() > 0)
    // edge cases through the whole codegen path
    import spark.implicits._
    val edge = Seq("", " ", "a b", "héllo wörld", "日本語テキスト",
      "a|b|c", "😀 emoji").toDF("s")
      .withColumn("native", CrossHash.h60(col("s")))
      .withColumn("chain", conv(substring(md5(col("s")), 1, 15), 16, 10)
        .cast("long"))
    assert(edge.filter(col("native") =!= col("chain")).count() == 0)
  }
}
