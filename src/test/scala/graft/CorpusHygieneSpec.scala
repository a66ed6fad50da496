package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusHygieneOps

/** First-principles re-derivations of the round-10 pack #12 (q254-q255)
  * from collected raw rows, plus the mirror-detection mechanism pinned
  * on a crafted corpus (sf0.001 itself has no cross-language collision,
  * so the fixture is what proves the flag can fire).
  */
class CorpusHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q254

  test("q254: per-lang mirror counts match a model over md5 groups, " +
    "and the flag fires on a crafted bilingual mirror") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val langsByText = docs.groupBy(_._2)
      .map { case (t, xs) => (t, xs.map(_._1).distinct.size) }
    val expect = docs.groupBy(_._1).map { case (lang, xs) =>
      val m = xs.count(d => langsByText(d._2) > 1).toLong
      (lang, xs.length.toLong, m, 1000 * m / xs.length)
    }.toSeq.sortBy(_._1)
    val got = CorpusHygieneOps.q254(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)

    // crafted corpus: the same text under two langs plus a clean doc
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q254_fixture").toString
    Seq(
      (1L, "shared mirror text body", "en", "s", 23L),
      (2L, "shared mirror text body", "de", "s", 23L),
      (3L, "unique english content here", "en", "s", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val fx = CorpusHygieneOps.q254(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(fx == Seq(("de", 1L, 1L, 1000L), ("en", 2L, 1L, 500L)),
      s"fixture mirror rows: $fx")
  }

  // ------------------------------------------------------------- q255

  test("q255: Good-Turing masses match an independent shingle count") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map
      .empty[(String, String), Long]
    docs.foreach { case (lang, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length >= 3)
        t.sliding(3).foreach { s =>
          val k = (lang, s.mkString(" "))
          counts(k) = counts.getOrElse(k, 0L) + 1
        }
    }
    val expect = counts.groupBy(_._1._1).map { case (lang, m) =>
      val n = m.values.sum
      val types = m.size.toLong
      val h = m.values.count(_ == 1L).toLong
      val d = m.values.count(_ == 2L).toLong
      (lang, n, types, h, d, 1000 * h / n,
        if (h == 0) null else java.lang.Long.valueOf(2000 * d / h))
    }.toSeq.sortBy(_._1)
    val got = CorpusHygieneOps.q255(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) null else java.lang.Long.valueOf(r.getLong(6))))
      .toSeq
    assert(got == expect)
    // the statistic must be LIVE here: hapax shingles exist per lang
    got.foreach { case (lang, _, _, h, _, _, _) =>
      assert(h > 0, s"no hapax shingles for $lang — statistic inert")
    }
  }
}
