package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextAnalysis

/** q172 (Gopher rule battery): a constructed corpus with one document
  * failing EXACTLY one rule each plus one passing all four — pins that
  * every rule fires independently and that the pass verdict is the
  * conjunction, which the per-language aggregate alone cannot show.
  */
class GopherRulesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  test("q172: each rule fires independently; pass is the conjunction") {
    val dir = Files.createTempDirectory("graft_gopher").toFile.getAbsolutePath
    import spark.implicits._
    def words(n: Int, len: Int, tag: String): Seq[String] =
      (1 to n).map(i => (tag + "x" * len).take(len))
        .zipWithIndex.map { case (w, i) => w.dropRight(2) + f"$i%02d" }
    // pass: 50 words, mwl 3940, 2 stopwords, all distinct
    val pass = ("the of " + words(48, 4, "p").mkString(" "))
    // fail word count only: 10 words (mwl 3700, 2 stopwords, distinct)
    val failWc = ("the of " + words(8, 4, "w").mkString(" "))
    // fail mean word length only: 48 8-char words -> mwl 7780
    val failMwl = ("the of " + words(48, 8, "m").mkString(" "))
    // fail stopwords only: 50 distinct 4-char words, no stopword
    val failStop = words(50, 4, "s").mkString(" ")
    // fail TTR only: "the of" + one word repeated 48 times -> ttr 60
    val failTtr = ("the of " + Seq.fill(48)("spam").mkString(" "))
    Seq(pass, failWc, failMwl, failStop, failTtr).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = TextAnalysis.q172(spark, dir).collect()
    assert(r.length == 1 && r.head.getString(0) == "xx")
    val Seq(nDocs, fWc, fMwl, fStop, fTtr, nPass, permille) =
      (1 to 7).map(r.head.getLong)
    assert(nDocs == 5L)
    assert((fWc, fMwl, fStop, fTtr) == ((1L, 1L, 1L, 1L)),
      s"each rule must fail exactly once: $r")
    assert(nPass == 1L && permille == 200L)
  }

  test("q172: every rule discriminates on the real corpus") {
    val rows = TextAnalysis.q172(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == 500L)
    def total(i: Int) = rows.map(_.getLong(i)).sum
    assert(total(2) > 0 && total(3) > 0 && total(4) > 0 && total(5) > 0,
      s"a never-firing rule is a fixture bug: ${rows.mkString(";")}")
    rows.foreach { r =>
      assert(r.getLong(6) <= r.getLong(1))
      assert(r.getLong(7) == r.getLong(6) * 1000 / r.getLong(1))
    }
  }
}
