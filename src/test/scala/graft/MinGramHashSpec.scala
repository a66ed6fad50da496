package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinGramHash

/** The native min_gram_hash must be bit-identical to the HOF
  * formulation it replaced (min over conv(substr(md5(substr)))) on the
  * real mixed-script corpus — including multi-byte text where codepoint
  * and UTF-16 indexing diverge.
  */
class MinGramHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"

  private val hofExpr =
    """aggregate(
      |  transform(sequence(1, least(length(text), 200) - 7),
      |    i -> cast(conv(substr(md5(substr(text, i, 8)), 1, 15), 16, 10)
      |              as bigint)),
      |  cast(9223372036854775807 as bigint), (acc, h) -> least(acc, h))"""
      .stripMargin

  test("native expression equals HOF formulation on the whole corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(col("text")) >= 8)
    val diff = docs
      .withColumn("native", MinGramHash.minGramHash(col("text"), 8, 200))
      .withColumn("hof", expr(hofExpr))
      .filter(col("native") =!= col("hof"))
    assert(diff.isEmpty, s"native/HOF fingerprints diverge:\n${
      diff.select("doc_id", "native", "hof").limit(5).collect().mkString("\n")}")
  }

  test("multi-byte and edge-length strings behave like the HOF version") {
    import spark.implicits._
    val cases = Seq(
      "abcdefgh",                       // exactly one window
      "日本語のテキストです、長めの一文。",  // multi-byte CJK
      "mixé ascii ünd ümlaut text!",    // latin + diacritics
      "🙂🙃🙂🙃🙂🙃🙂🙃ab",              // surrogate pairs (non-BMP)
      "a" * 300)                        // beyond the 200-codepoint cap
    val df = cases.toDF("text").filter(length(col("text")) >= 8)
      .withColumn("native", MinGramHash.minGramHash(col("text"), 8, 200))
      .withColumn("hof", expr(hofExpr))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("native") == r.getAs[Long]("hof"),
        s"diverged on ${r.getString(0).take(20)}")
    }
  }

  test("SQL registration resolves min_gram_hash") {
    import spark.implicits._
    val viaSql = Seq("fingerprint me please").toDF("text")
      .createOrReplaceTempView("mgh_t")
    val n = spark.sql(
      "SELECT min_gram_hash(text, 8, 200) AS f FROM mgh_t").collect()
    assert(n.length == 1 && n.head.getLong(0) > 0)
  }

  test("shorter-than-k strings return the fold identity") {
    import spark.implicits._
    val r = Seq("short").toDF("text")
      .select(MinGramHash.minGramHash(col("text"), 8, 200).as("f"))
      .head()
    assert(r.getLong(0) == Long.MaxValue)
  }
}
