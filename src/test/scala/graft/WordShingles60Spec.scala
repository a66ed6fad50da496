package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSig, WordShingles60}

/** [[WordShingles60]] and [[graft.functions.MinHashSigLongs]] replaced
  * the interpreted shingle-lambda formulations inside q21/q46/q89 —
  * these tests pin bit-equivalence against the exact HOF spellings
  * they replaced, including the two semantic edges (concat_ws null
  * skipping; distinct-on-hash vs distinct-on-string invariance of the
  * min-fold).
  */
class WordShingles60Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toks = expr("filter(split(text, ' '), t -> t <> '')")

  test("native shingle hashes equal the concat_ws lambda + h60 chain, in order") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("native",
        WordShingles60.wordShingles60(col("toks"), 3))
      .withColumn("lambda", expr(
        """transform(sequence(0, size(toks)-3),
          |  i -> cast(conv(substr(md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])), 1, 15), 16, 10) as bigint))"""
          .stripMargin))
    assert(docs.filter(col("native") =!= col("lambda")).count() == 0)
    assert(docs.count() > 0)
  }

  test("signature from non-distinct native hashes equals the distinct-shingle signature") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("fused", MinHashSig.minhashSigLongs(
        WordShingles60.wordShingles60(col("toks"), 3), 16))
      .withColumn("classic", MinHashSig.minhashSig(expr(
        """array_distinct(transform(sequence(0, size(toks)-3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"""
          .stripMargin), 16))
    assert(docs.filter(col("fused") =!= col("classic")).count() == 0)
  }

  test("null tokens are skipped exactly like concat_ws; short arrays yield no windows") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", null, "c", "d")),
      (2L, Seq("x", "y")), // size < k → no windows
      (3L, Seq[String](null, null, null))) // all-null windows hash ""
      .toDF("id", "arr")
      .withColumn("native", WordShingles60.wordShingles60(col("arr"), 3))
      .withColumn("lambda", when(size(col("arr")) >= 3, expr(
        """transform(sequence(0, size(arr)-3),
          |  i -> cast(conv(substr(md5(concat_ws(' ', arr[i], arr[i+1], arr[i+2])), 1, 15), 16, 10) as bigint))"""
          .stripMargin)).otherwise(expr("array()")))
    assert(df.filter(col("native") =!= col("lambda")).count() == 0)
    assert(df.filter(col("id") === 2L).select(size(col("native"))).head().getInt(0) == 0)
  }
}
