package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.FingerprintOps
import graft.streaming.StreamingWinnow

/** Streaming winnow-index probe: live verdicts against a static index
  * must carry the winnowing match guarantee (any shared passage of
  * ≥ k+w−1 tokens is caught), a verbatim copy must score ~full
  * containment against its source, unrelated docs must stay silent,
  * and each arriving doc is matched exactly once, in its own batch.
  */
class StreamingWinnowSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("copy detection, passage guarantee, and exactly-once per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // indexed corpus: two unrelated 30-token docs
    val docA = words("aa", 30).mkString(" ")
    val docB = words("bb", 30).mkString(" ")
    val index = StreamingWinnow.indexOf(
      Seq((10L, docA), (20L, docB)).toDF("doc_id", "text")).cache()

    // probe 1: verbatim copy of doc A -> must match 10 with FULL
    //          containment (identical fingerprint set)
    // probe 2: 7-token passage of doc B (= k+w-1) inside novel text ->
    //          the guarantee says >= 1 shared fingerprint with 20
    // probe 3: fully novel -> no row
    // probe 4: too short to fingerprint -> no row
    val passage = words("bb", 30).slice(10, 17)
    val probe2 = (words("xx", 12) ++ passage ++ words("yy", 12)).mkString(" ")
    val probe3 = words("zz", 30).mkString(" ")
    val probe4 = words("s", 4).mkString(" ")

    val input = MemoryStream[(Long, String)]
    val got = mutable.Map[Long, (Long, Long, Long)]()
    val batchIds = mutable.Map[Long, Long]()
    val q = StreamingWinnow.start(
      input.toDF().toDF("doc_id", "text"), index) { (matches, id) =>
      matches.collect().foreach { r =>
        val doc = r.getLong(0)
        assert(!got.contains(doc), s"doc $doc matched twice")
        got(doc) = (r.getLong(1), r.getLong(2), r.getLong(3))
        batchIds(doc) = id
      }
    }
    try {
      input.addData((1L, docA), (4L, probe4))
      q.processAllAvailable()
      assert(got.keySet == Set(1L), s"batch 1: $got")
      input.addData((2L, probe2), (3L, probe3))
      q.processAllAvailable()
      assert(got.keySet == Set(1L, 2L), s"batch 2: $got")
    } finally q.stop()

    val (m1, s1, c1) = got(1L)
    assert(m1 == 10L, "the copy must match its source")
    assert(c1 == 1000L, s"verbatim copy = full containment, got $c1")
    val (m2, s2, c2) = got(2L)
    assert(m2 == 20L, "the passage must match the doc it was cut from")
    assert(s2 >= 1L, "k+w-1-token passage: the winnowing guarantee")
    assert(c2 < 1000L)
    assert(batchIds(1L) < batchIds(2L))
    assert(s1 > s2, "a full copy shares more fingerprints than a passage")
  }

  test("probe equals a first-principles model over the real corpus (self-probe)") {
    val docs = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // model: winnow fp sets, df-capped index, best match per doc
    def winnowSet(text: String): Option[Set[Long]] = {
      val toks = text.split(' ').filter(_.nonEmpty)
      if (toks.length < FingerprintOps.WinnowK + FingerprintOps.WinnowW - 1) None
      else Some(toks.sliding(FingerprintOps.WinnowK)
        .map(w => ShingleModel.h60(w.mkString(" "))).toVector
        .sliding(FingerprintOps.WinnowW).map(_.min).toSet)
    }
    val sets = docs.flatMap { case (id, t) => winnowSet(t).map(id -> _) }.toMap
    val postings = sets.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size <= FingerprintOps.WinnowMaxDf)
    val expected = sets.flatMap { case (id, s) =>
      val shares = s.toSeq.flatMap(postings.getOrElse(_, Nil))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (shares.isEmpty) None
      else {
        val (m, n) = shares.toSeq.maxBy { case (mid, cnt) => (cnt, -mid) }
        Some(id -> (m, n, 1000L * n / s.size))
      }
    }
    val corpus = graft.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val index = StreamingWinnow.indexOf(corpus).cache()
    val got = StreamingWinnow.probeBatch(corpus, index).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected,
      s"only-in-got=${(got.keySet -- expected.keySet).take(5)} " +
        s"only-in-model=${(expected.keySet -- got.keySet).take(5)} " +
        s"diff=${got.collect { case (k, v) if expected.get(k).exists(_ != v) => (k, v, expected(k)) }.take(5)}")
    assert(got.nonEmpty)
  }
}
