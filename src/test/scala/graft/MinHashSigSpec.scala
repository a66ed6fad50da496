package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CrossHash, MinHashSig}

/** The native minhash_sig must be bit-identical to the declarative
  * explode → 16×min group-by formulation it replaced in q21.
  */
class MinHashSigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"
  private val N = 16

  test("native signature equals explode+groupBy minhash on the corpus") {
    val shingled = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"""
          .stripMargin).as("shingles"))

    val native = shingled
      .select(col("doc_id"), MinHashSig.minhashSig(col("shingles"), N).as("sig"))

    val declarative = shingled
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .withColumn("h", CrossHash.h60(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(
        min(CrossHash.universal(col("h"), 0)).as("m0"),
        (1 until N).map(j =>
          min(CrossHash.universal(col("h"), j)).as(s"m$j")): _*)
      .select(col("doc_id"),
        array((0 until N).map(j => col(s"m$j")): _*).as("sig"))

    val diff = native.as("n").join(declarative.as("d"), "doc_id")
      .filter(col("n.sig") =!= col("d.sig"))
    assert(diff.isEmpty, s"signatures diverge:\n${diff.limit(3).collect().mkString("\n")}")
    assert(native.count() == declarative.count())
  }

  test("SQL registration resolves minhash_sig") {
    val r = spark.sql(
      "SELECT minhash_sig(array('a b c', 'b c d'), 4) AS sig").head()
    assert(r.getSeq[Long](0).length == 4)
    assert(r.getSeq[Long](0).forall(v => v >= 0 && v < CrossHash.P))
  }

  test("empty shingle array yields the fold identity") {
    val r = spark.sql(
      "SELECT minhash_sig(cast(array() AS array<string>), 4) AS sig").head()
    assert(r.getSeq[Long](0).forall(_ == Long.MaxValue))
  }
}
