package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{MixtureOps, ReleaseOps, RetrievalOps, TextAnalysis}

/** q163 (RRF fusion), q164 (repetition profile), q165 (temperature
  * mixture): fixtures the oracle gate cannot provide — a doc ranked by
  * BOTH retrieval legs must outscore either single-leg doc at equal
  * rank (the point of RRF), a constructed pathological repeater must
  * trip both repetition flags, and the α=1/2 reweighting must compress
  * a skewed source distribution toward (but never past) uniform.
  */
class RrfMixDecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  // ---------------------------------------------------------------- q163

  test("q163: fused list is bounded, sorted, and score-bounded") {
    val rows = RetrievalOps.q163(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= RetrievalOps.RrfTop)
    val scores = rows.map(_.getLong(3))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)),
      "rrf_score must be non-increasing")
    // one leg contributes at most 10^6/(60+1); both legs at most double it
    val maxOne = RetrievalOps.RrfScale / (RetrievalOps.RrfK + 1)
    assert(scores.head <= 2 * maxOne && scores.last > 0)
  }

  test("q163: a doc in BOTH legs outscores same-rank single-leg docs") {
    val rows = RetrievalOps.q163(spark, sfDir).collect()
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val lexOnly = rows.filter(r => !r.isNullAt(1) && r.isNullAt(2))
    // RRF guarantee: rank (a,b) in both lists beats rank min(a,b) in one
    for (b <- both; s <- lexOnly
         if s.getLong(1) >= math.min(b.getLong(1), b.getLong(2)))
      assert(b.getLong(3) > s.getLong(3),
        s"dual-leg doc ${b.getLong(0)} must outscore single-leg ${s.getLong(0)}")
  }

  // ---------------------------------------------------------------- q164

  test("q164: a pathological repeater trips both flags; clean text neither") {
    val dir = Files.createTempDirectory("graft_rep").toFile.getAbsolutePath
    import spark.implicits._
    // repeater: one token 50 times -> dup_tok = 980, dup_big = 979
    // clean: all-distinct tokens and bigrams -> both permilles 0
    val rep = Seq.fill(50)("spam").mkString(" ")
    val clean = (1 to 50).map(i => s"uniq$i").mkString(" ")
    Seq((1L, rep, "en", "s0", rep.length.toLong),
      (2L, clean, "en", "s1", clean.length.toLong),
      (3L, clean, "de", "s1", clean.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val byLang = TextAnalysis.q164(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // en: repeater (dup_tok=980, dup_big=1000*(48)/49=979) + clean (0,0)
    assert(byLang("en")._1 == 2L && byLang("en")._2 == 1L,
      s"exactly the repeater must flag: $byLang")
    assert(byLang("en")._3 == (980L + 0L) / 2 &&
      byLang("en")._4 == (979L + 0L) / 2)
    assert(byLang("de") == ((1L, 0L, 0L, 0L)),
      s"clean doc must carry zero permilles: $byLang")
  }

  test("q164: permilles stay in [0, 1000) on the real corpus") {
    val rows = TextAnalysis.q164(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows; i <- 3 to 4)
      assert(r.getLong(i) >= 0 && r.getLong(i) < 1000)
    // flags must be a subset of docs
    for (r <- rows) assert(r.getLong(2) <= r.getLong(1))
  }

  // ---------------------------------------------------------------- q165

  test("q165: sqrt-reweighting compresses skew toward uniform, never past") {
    val dir = Files.createTempDirectory("graft_mix").toFile.getAbsolutePath
    import spark.implicits._
    // big: 64 docs x 100 tokens = 6400 tokens; small: 4 docs x 100 = 400
    // natural ratio 16:1, sqrt ratio 4:1 — the flattening is the contract
    val text100 = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs =
      (1 to 64).map(i => (i.toLong, text100, "en", "big", 100L)) ++
        (1 to 4).map(i => (100L + i, text100, "en", "small", 100L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = MixtureOps.q165(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val (bigW, smallW) = (rows("big")._3, rows("small")._3)
    // natural share of `big` would be 941‰; sqrt share must sit strictly
    // between uniform (500) and natural, i.e. the 4:1 isqrt split = 800
    assert(bigW == 800L && smallW == 200L, s"weights: $rows")
    // quotas follow the same split and the small source oversamples
    assert(rows("small")._5 > rows("big")._5,
      "low-resource source must carry the higher oversampling factor")
    // quota mass conserves the budget up to truncation
    val totalQuota = rows.values.map(_._4).sum
    assert(totalQuota <= MixtureOps.MixBudget &&
      totalQuota > MixtureOps.MixBudget - rows.size)
  }

  test("q165: weights sum to ~1000 permille on the real corpus") {
    val rows = MixtureOps.q165(spark, sfDir).collect()
    val wSum = rows.map(_.getLong(3)).sum
    assert(wSum <= 1000 && wSum > 1000 - rows.length,
      s"permille mass must be 1000 minus truncation: $wSum")
  }

  // ---------------------------------------------------------------- q166

  /** First ids of each split under the hash assignment, so fixtures can
    * plant docs in chosen splits without reimplementing the hash.
    */
  private def idsBySplit(n: Int): Map[String, Seq[Long]] = {
    import spark.implicits._
    import graft.queries.ReleaseOps
    (1L to n.toLong).toDF("doc_id")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        ReleaseOps.splitOf(org.apache.spark.sql.functions.col("doc_id"))
          .as("split"))
      .collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSeq.sorted }
  }

  test("q166: partial 13-gram containment flags; whole-doc fingerprint would not") {
    val dir = Files.createTempDirectory("graft_dec").toFile.getAbsolutePath
    import spark.implicits._
    val splits = idsBySplit(100)
    val trainId = splits("train").head
    val Seq(testA, testB) = splits("test").take(2)

    val trainToks = (1 to 40).map(i => s"w$i")
    // test doc A: 30-token prefix of the train doc + 10 novel tokens ->
    // 18 of its 28 distinct 13-grams hit the train set = 642 permille
    val contaminated = (trainToks.take(30) ++ (1 to 10).map(i => s"nv$i"))
      .mkString(" ")
    val clean = (1 to 40).map(i => s"zz$i").mkString(" ")
    Seq((trainId, trainToks.mkString(" "), "en"),
      (testA, contaminated, "en"),
      (testB, clean, "en"))
      .map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val Array(row) = ReleaseOps.q166(spark, dir).collect()
    assert(row.getString(0) == "en" && row.getLong(1) == 2L,
      s"both test docs must be scanned: $row")
    assert(row.getLong(2) == 1L,
      s"exactly the partial-containment doc must flag: $row")
    assert(row.getLong(3) == 1000L * 18 / 28,
      s"max overlap must be the hand-computed 642 permille: $row")
  }

  // ---------------------------------------------------------------- q167

  test("q167: surprisal matches the hand-computed bit-length identity") {
    val dir = Files.createTempDirectory("graft_surp").toFile.getAbsolutePath
    import spark.implicits._
    // corpus: "a a a a" + "a b" -> N=6 (bin len 3), cnt(a)=5 (len 3),
    // cnt(b)=1 (len 1). surp(a)=0, surp(b)=2. doc2 = 1000*2/2 = 1000.
    Seq((1L, "a a a a", "en", "s0", 7L), (2L, "a b", "en", "s0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.q167(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows == Map(1L -> 0L, 2L -> 1000L), s"got $rows")
  }

  test("q167: scores are valid permilles of a bounded surprisal") {
    val rows = TextAnalysis.q167(spark, sfDir).collect()
    assert(rows.length == TextAnalysis.SurprisalTop)
    // max token surprisal is floor(log2 N) <= 63 -> permille < 64000
    for (r <- rows)
      assert(r.getLong(3) >= 0 && r.getLong(3) < 64000)
    val scores = rows.map(_.getLong(3))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
  }
}
