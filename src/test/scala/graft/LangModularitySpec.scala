package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** q221's modularity arithmetic re-derived from first principles on the
  * real corpus: collect the (memoized) candidate-pair graph and the
  * lang map, recompute every per-language cell in driver Scala, and
  * compare exactly — including the Σ_c d_c = 2m handshake identity that
  * any miscounted endpoint would break.
  */
class LangModularitySpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"

  test("q221 matches first-principles modularity over the collected graph") {
    val pairs = Dedup.candidatePairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.get(0), r.get(1)))
    val langs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.get(0) -> r.getString(1)).toMap

    val m = pairs.length.toLong
    val endpoints = pairs.flatMap { case (a, b) => Seq(a, b) }
    val degByLang = endpoints.groupBy(langs(_)).view
      .mapValues(_.length.toLong).toMap
    val nodesByLang = endpoints.distinct.groupBy(langs(_)).view
      .mapValues(_.size.toLong).toMap
    val intraByLang = pairs
      .filter { case (a, b) => langs(a) == langs(b) }
      .groupBy { case (a, _) => langs(a) }.view
      .mapValues(_.size.toLong).toMap

    // handshake identity: every pair contributes exactly two endpoints
    assert(degByLang.values.sum == 2 * m)

    val got = Dedup.q221(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == degByLang.keySet)
    got.foreach { r =>
      val lang = r.getString(0)
      val (d, e) = (degByLang(lang), intraByLang.getOrElse(lang, 0L))
      assert(r.getLong(1) == nodesByLang(lang), s"n_nodes($lang)")
      assert(r.getLong(2) == e, s"intra_pairs($lang)")
      assert(r.getLong(3) == d, s"endpoint_degree($lang)")
      assert(r.getLong(4) == 4L * m * e - d * d, s"q_contrib_scaled($lang)")
    }
  }
}
