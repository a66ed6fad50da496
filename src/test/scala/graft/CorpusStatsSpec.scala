package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusStats

/** q175/q176 boundary semantics: the degenerate distributions whose
  * exact metric values are known in closed form — all-same-type
  * (λ = 1000‰), all-distinct (λ = 0), uniform (Gini = 0), and a
  * dominated vocabulary (Gini near its (n−1)/n ceiling).
  */
class CorpusStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(docs: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft_cstats").toFile.getAbsolutePath
    import spark.implicits._
    docs.map { case (i, t, l) => (i, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q175: single-type corpus hits λ=1000‰; all-distinct hits 0") {
    val dir = corpus(Seq(
      (0L, Seq.fill(40)("spam").mkString(" "), "aa"),
      (1L, (1 to 40).map(i => s"w$i").mkString(" "), "bb")))
    val byLang = CorpusStats.q175(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(byLang("aa") == ((40L, 1L, 1000L)),
      s"one type drawing against itself is certain: $byLang")
    assert(byLang("bb") == ((40L, 40L, 0L)),
      s"all-distinct types can never collide: $byLang")
  }

  test("q176: uniform vocabulary has Gini exactly 0; dominance approaches the ceiling") {
    // uniform: 10 types x 5 occurrences; dominated: 9 types once + one
    // type 91 times -> G = (2S - 11*100)/(10*100), S computed by hand
    val uniform = (1 to 5).flatMap(_ => (1 to 10).map(i => s"t$i"))
    val skewed = (1 to 9).map(i => s"r$i") ++ Seq.fill(91)("spam")
    val dir = corpus(Seq(
      (0L, uniform.mkString(" "), "uu"),
      (1L, skewed.mkString(" "), "kk")))
    val byLang = CorpusStats.q176(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(byLang("uu") == ((10L, 50L, 0L)),
      s"uniform frequencies must score zero: $byLang")
    // ranks 1..9 hold n=1, rank 10 holds n=91: S = 45 + 910 = 955
    // G‰ = 1000*(2*955 - 11*100) DIV (10*100) = 810
    assert(byLang("kk") == ((10L, 100L, 810L)), s"hand-computed Gini: $byLang")
  }
}
