package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EvalOps

/** First-principles re-derivations of the round-10 pack #11 (q252-q253):
  * the Neyman weights recomputed from raw rows with independent integer
  * moments, and the blast-radius TRANSITIVE mechanism pinned on a
  * crafted corpus where a train paraphrase of a leaked document must be
  * quarantined even though its own fingerprint is clean.
  */
class EvalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  private val Stops = Set("the", "a", "of", "and", "in")

  private def qualU3(text: String): Long = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val nTok = toks.length.toLong
    val stops = toks.count(Stops.contains).toLong
    val alpha = text.count(c => c >= 'a' && c <= 'z').toLong
    400 * math.min(nTok, 50) / 50 + 300 * (nTok - stops) / nTok +
      300 * alpha / text.length
  }

  // ------------------------------------------------------------- q252

  test("q252: Neyman weights and allocations match independent integer " +
    "moments, and the weights favor high-variance strata") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), qualU3(r.getString(1))))
    val mom = docs.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      val s2 = xs.map(q => q._2 * q._2).sum
      (lang, n, math.floor(math.sqrt((n * s2 - s * s).toDouble)).toLong)
    }.sortBy(_._1)
    val totW = mom.map(_._3).sum
    val totN = mom.map(_._2).sum
    val expect = mom.map { case (lang, n, w) =>
      val ney = 1000 * w / totW
      val prop = 1000 * n / totN
      (lang, n, w, ney, prop, ney - prop)
    }
    val got = EvalOps.q252(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // the budget is conserved up to floor slack (< one doc per stratum)
    val alloc = got.map(_._4).sum
    assert(alloc <= 1000 && alloc > 1000 - got.length)
  }

  // ------------------------------------------------------------- q253

  test("q253: a train paraphrase of a leaked doc is quarantined " +
    "TRANSITIVELY on a crafted corpus; direct/clean rows exact") {
    import spark.implicits._
    def split(id: Long): String = {
      val b = h60(s"split:$id") % 1000
      if (b < 900) "train" else "eval"
    }
    // hunt deterministic ids for each role
    def findId(from: Long, s: String): Long =
      Iterator.iterate(from)(_ + 1).find(id => split(id) == s).get
    val eId = findId(1000L, "eval")
    val aId = findId(2000L, "train") // exact copy of E -> direct
    val bId = findId(3000L, "train") // near-dup of A -> transitive
    val cId = findId(4000L, "train") // unrelated -> clean

    val base = (0 until 100).map(i => s"tok$i").mkString(" ")
    val nearDup = (0 until 99).map(i => s"tok$i").mkString(" ") + " changed"
    val other = (0 until 100).map(i => s"zzz$i").mkString(" ")
    val rows = Seq(
      (eId, base, "en", "src", base.length.toLong),
      (aId, base, "en", "src", base.length.toLong),
      (bId, nearDup, "en", "src", nearDup.length.toLong),
      (cId, other, "en", "src", other.length.toLong))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q253_fixture").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    // the fixture only works if the banding actually pairs A with B
    val pairs = graft.queries.Dedup.candidatePairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ab = (math.min(aId, bId), math.max(aId, bId))
    assert(pairs.contains(ab),
      s"fixture near-dup did not band-collide: $pairs")

    val got = EvalOps.q253(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(("en", 3L, 1L, 1L, 666L)),
      s"blast radius rows: $got")
  }
}
