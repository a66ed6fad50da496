package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CrossHash
import graft.queries.Dedup

/** q147: full first-principles recomputation of the MinHash
  * calibration audit at sf0.01 — an independent Scala model of the
  * ENTIRE chain (3-shingle h60 sets → 16 universal-hash signature →
  * 4×4 banding → bucket pairs → integer est/exact/err per-mille), so
  * the query's candidate generation, estimator, and exact verifier are
  * all pinned against something that shares no code with the engine.
  */
class MinHashCalibrationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  private def shingles3(text: String): Set[Long] = {
    val t = text.split(' ').filter(_.nonEmpty)
    if (t.length < 3) Set.empty
    else t.sliding(3).map(w => ShingleModel.h60(w.mkString(" "))).toSet
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q147 equals a first-principles calibration model") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sets = docs.map { case (id, t) => id -> shingles3(t) }
      .filter(_._2.nonEmpty).toMap

    def sig(hs: Set[Long]): IndexedSeq[Long] =
      (0 until 16).map { j =>
        hs.map(h =>
          (CrossHash.hashA(j) * (h % CrossHash.P) + CrossHash.hashB(j))
            % CrossHash.P).min
      }
    val sigs = sets.map { case (id, hs) => id -> sig(hs) }

    // 4 bands of 4 rows, bucketed by the md5 of the comma-joined rows
    val buckets = sigs.toSeq.flatMap { case (id, s) =>
      (0 until 4).map(b =>
        (b, md5hex(s.slice(b * 4, b * 4 + 4).mkString(","))) -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val pairs = buckets.values.flatMap { ids =>
      for (i <- ids.indices; k <- i + 1 until ids.length)
        yield (ids(i), ids(k))
    }.toSet

    val expected = pairs.toSeq.sorted.map { case (a, b) =>
      val (sa, sb) = (sets(a), sets(b))
      val nInter = (sa intersect sb).size.toLong
      val agree = sigs(a).zip(sigs(b)).count { case (u, v) => u == v }.toLong
      val est = 1000L * agree / 16L
      val exact = 1000L * nInter / (sa.size + sb.size - nInter)
      (a, b, est, exact, math.abs(est - exact))
    }

    val got = Dedup.q147(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must surface candidate pairs")
    // calibration must be informative on this corpus: the estimator is
    // unbiased-ish on true near-dups, so SOME pair must sit within 125
    // permille of truth, and the audit must also catch real error
    assert(expected.exists(_._5 <= 125))
  }
}
