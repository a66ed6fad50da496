package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CrossHash, MinHashAggregator}

/** MinHash typed Aggregator ≡ the 16×min() expression formulation. */
class MinHashAggregatorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("single-pass aggregator signature equals 16 separate min() aggs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shingleHashes = docs
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"""
          .stripMargin)).as("shingle"))
      .withColumn("h", CrossHash.h60(col("shingle")))
      .cache()

    val viaExprs = shingleHashes.groupBy("doc_id")
      .agg(
        min(CrossHash.universal(col("h"), 0)).as("m0"),
        (1 until 16).map(j =>
          min(CrossHash.universal(col("h"), j)).as(s"m$j")): _*)
      .select(col("doc_id"),
        array((0 until 16).map(j => col(s"m$j")): _*).as("sig"))

    val mh = udaf(new MinHashAggregator(16))
    val viaAggregator = shingleHashes.groupBy("doc_id")
      .agg(mh(col("h")).as("sig"))

    val joined = viaExprs.as("a")
      .join(viaAggregator.as("b"), "doc_id")
      .withColumn("eq", col("a.sig") === col("b.sig"))
    val total = joined.count()
    val equal = joined.filter(col("eq")).count()
    assert(total > 0 && equal == total, s"$equal/$total signatures equal")
    shingleHashes.unpersist()
  }

  test("signature width beyond the coefficient table is rejected") {
    intercept[IllegalArgumentException](new MinHashAggregator(64))
  }
}
