package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, DedupAuditOps}

/** First-principles re-derivations of the round-10 pack #15 (q260-q261):
  * blocking recall recomputed from raw text fingerprints against the
  * collected candidate frame, and the keep-policy divergence recomputed
  * from collected labels + an independent quality score.
  */
class DedupAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.1" // the dup-active regime

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val Stops = Set("the", "a", "of", "and", "in")

  private def qualU3(text: String): Long = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val nTok = toks.length.toLong
    val stops = toks.count(Stops.contains).toLong
    val alpha = text.count(c => c >= 'a' && c <= 'z').toLong
    400 * math.min(nTok, 50) / 50 + 300 * (nTok - stops) / nTok +
      300 * alpha / text.length
  }

  // ------------------------------------------------------------- q260

  test("q260: recall over md5-derived true pairs matches the collected " +
    "candidate frame, and every exact-dup pair is caught at sf0.1") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val truth = docs.groupBy(d => md5Hex(d._2)).values
      .filter(_.length > 1)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    assert(truth.nonEmpty, "sf0.1 must carry exact-dup ground truth")
    val cand = Dedup.candidatePairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = truth.count(cand.contains).toLong
    val r = DedupAuditOps.q260(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == truth.size.toLong)
    assert(r(0).getLong(1) == caught)
    assert(r(0).getLong(2) == 1000 * caught / truth.size)
    // the gated corpus never overflows a bucket (DedupHotBucketSpec)
    assert(r(0).getLong(3) == 0L, "n_evicted must be 0 at sf0.1")
    // identical text => identical shingles => identical bands: with the
    // hot-bucket cap inert on this corpus the recall must be perfect
    assert(caught == truth.size.toLong,
      s"banding missed ${truth.size - caught} exact-dup pairs")
  }

  test("q260: a hot bucket overflowing the cap is counted in n_evicted " +
    "and the recall drop is exactly the evicted pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-q260-hot-")
    try {
      import spark.implicits._
      val n = Dedup.MaxBucketDocs + 44 // 300 identical docs, 44 evicted
      val boiler = "subscribe to our newsletter for the latest updates"
      (1L to n.toLong).map(i => (i, boiler)).toDF("doc_id", "text")
        .repartition(4)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = DedupAuditOps.q260(spark, dir.toString).collect()
      assert(r.length == 1)
      val cap = Dedup.MaxBucketDocs.toLong
      val truePairs = n.toLong * (n - 1) / 2
      val caughtPairs = cap * (cap - 1) / 2 // all 4 bands share one bucket
      assert(r(0).getLong(0) == truePairs)
      assert(r(0).getLong(1) == caughtPairs)
      assert(r(0).getLong(2) == 1000 * caughtPairs / truePairs)
      // 4 bands x (n - cap) band-rows evicted
      assert(r(0).getLong(3) == 4L * (n - cap))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir.toFile)
    }
  }

  // ------------------------------------------------------------- q261

  test("q261: per-lang policy divergence matches an independent model " +
    "over collected labels") {
    val textById = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    val labels = Dedup.ccLabels(spark, sfDir)._1.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = labels.groupBy(_._2).values.map { cluster =>
      val ids = cluster.map(_._1).sorted
      val minId = ids.head
      val qPick = ids.map(id => (id, qualU3(textById(id)._2)))
        .minBy { case (id, q) => (-q, id) }
      (textById(minId)._1, qPick._1 != minId,
        qPick._2 - qualU3(textById(minId)._2))
    }.toSeq.groupBy(_._1).map { case (lang, xs) =>
      val nd = xs.count(_._2).toLong
      (lang, xs.length.toLong, nd, xs.map(_._3).sum,
        1000 * nd / xs.length)
    }.toSeq.sortBy(_._1)
    val got = DedupAuditOps.q261(spark, sfDir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    // the quality gain is nonnegative by construction (the quality pick
    // is at least as good as the min-id pick)
    got.foreach { case (lang, _, _, gain, _) =>
      assert(gain >= 0, s"$lang negative quality gain")
    }
  }
}
