package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{FingerprintOps, GraphRank, MonitoringOps}

/** q206 (HITS), q207 (winnowing), q208 (Burrows' Delta): each verified
  * against a first-principles driver-side re-derivation over the
  * collected inputs — an independent implementation path, so a bug that
  * hits both engines' join-based formulation identically would still be
  * caught — plus the structural properties the operators exist for
  * (the winnowing match guarantee, the stylometric-outlier ordering).
  */
class FingerprintOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  // -------------------------------------------------------------- model

  /** First-principles winnow: ordered 4-gram h60 stream, sliding
    * 4-hash windows, min per window, value-distinct selection.
    */
  private def winnowSets(text: String): Option[(Int, Set[Long])] = {
    val toks = text.split(' ').filter(_.nonEmpty)
    if (toks.length < FingerprintOps.WinnowK + FingerprintOps.WinnowW - 1) None
    else {
      val hashes = toks.sliding(FingerprintOps.WinnowK)
        .map(w => ShingleModel.h60(w.mkString(" "))).toVector
      val sel = hashes.sliding(FingerprintOps.WinnowW).map(_.min).toSet
      Some((hashes.length, sel))
    }
  }

  // ---------------------------------------------------------------- q207

  test("q207 equals a first-principles winnow over the collected corpus") {
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.flatMap { case (_, lang, text) =>
      winnowSets(text).map { case (nGrams, sel) => (lang, nGrams, sel.size) }
    }.groupBy(_._1).map { case (lang, rows) =>
      val grams = rows.map(_._2.toLong).sum
      val selected = rows.map(_._3.toLong).sum
      lang -> (rows.length.toLong, grams, selected, 1000 * selected / grams)
    }
    val got = FingerprintOps.q207(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    // selection density sits in the theoretical neighborhood of
    // 2/(w+1) = 400 permille (random-ish hashes)
    got.values.foreach { case (_, _, _, density) =>
      assert(density > 250 && density < 550, s"degenerate density $density")
    }
  }

  test("q207 guarantee: two docs sharing a >= k+w-1 token passage share a fingerprint") {
    // the winnowing theorem: any match of length >= k+w-1 (= 7 tokens)
    // is caught. The model is pinned to the query by the corpus test
    // above, so the property transfers.
    val passage = "alpha beta gamma delta epsilon zeta eta"
    val a = s"unrelated prefix words here $passage and a suffix"
    val b = s"$passage totally different continuation of text stream"
    val Some((_, selA)) = winnowSets(a)
    val Some((_, selB)) = winnowSets(b)
    assert((selA & selB).nonEmpty,
      "shared 7-token passage must share a winnow fingerprint")
  }

  // ---------------------------------------------------------------- q206

  test("q206 equals first-principles integer HITS over the collected edge list") {
    val edges = GraphRank.syndicationEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(edges.nonEmpty, "sf0.01 corpus must contain syndication edges")
    val nodes = graft.Tables.table(spark, sfDir, "documents")
      .select("source").distinct().collect().map(_.getString(0)).sorted
    val scale = GraphRank.HitsScale
    var auth = nodes.map(_ -> scale).toMap
    var hub = Map.empty[String, Long]
    for (_ <- 1 to GraphRank.HitsIterations) {
      val hraw = nodes.map { v =>
        v -> edges.collect { case (f, t) if f == v => auth(t) }.sum
      }.toMap
      val hmax = hraw.values.max
      hub = hraw.map { case (v, r) =>
        v -> (if (hmax == 0) 0L else r * scale / hmax)
      }
      val araw = nodes.map { v =>
        v -> edges.collect { case (f, t) if t == v => hub(f) }.sum
      }.toMap
      val amax = araw.values.max
      auth = araw.map { case (v, r) =>
        v -> (if (amax == 0) 0L else r * scale / amax)
      }
    }
    val got = FingerprintOpsSpec.collectQ206(spark, sfDir)
    assert(got.map(_._1).toSet == nodes.toSet)
    got.foreach { case (src, h, a) =>
      assert(h == hub(src), s"hub mismatch at $src: $h vs ${hub(src)}")
      assert(a == auth(src), s"auth mismatch at $src: $a vs ${auth(src)}")
    }
    // the scores separate roles: some source must have auth > hub or
    // hub > auth (a syndication graph is not symmetric)
    assert(got.exists { case (_, h, a) => h != a })
  }

  // ---------------------------------------------------------------- q209

  test("q209 equals a first-principles exact KS statistic over collected lengths") {
    val aLens = graft.Tables.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0).length.toLong)
    val bLens = graft.queries.ReleaseOps.snapshotBDocs(spark, sfDir)
      .select("text").collect().map(_.getString(0).length.toLong)
    val (na, nb) = (aLens.length.toLong, bLens.length.toLong)
    val domain = (aLens ++ bLens).distinct.sorted
    var best = -1L
    var atValue = -1L
    domain.foreach { v =>
      val gap = math.abs(
        aLens.count(_ <= v) * nb - bLens.count(_ <= v) * na)
      if (gap > best) { best = gap; atValue = v }
    }
    val row = MonitoringOps.q209(spark, sfDir).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(row.getLong(2) == best, s"D ${row.getLong(2)} vs model $best")
    assert(row.getLong(3) == 1000 * best / (na * nb))
    assert(row.getLong(4) == atValue)
    assert(best > 0, "the derived release must actually drift")
  }

  // ---------------------------------------------------------------- q210

  test("q210 equals a first-principles winnow-index overlap probe") {
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sets = docs.flatMap { case (id, text) =>
      winnowSets(text).map { case (_, sel) => id -> sel }
    }.toMap
    val df = sets.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pairable = df.filter { case (_, ds) =>
      ds.size >= 2 && ds.size <= FingerprintOps.WinnowMaxDf }
    val shared = pairable.values.flatMap { ds =>
      val sorted = ds.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= FingerprintOps.WinnowMinShared).toMap
    val expected = shared.toSeq.map { case ((a, b), n) =>
      (a, b, n, 1000 * n / math.min(sets(a).size, sets(b).size))
    }.sortBy { case (a, b, n, _) => (-n, a, b) }
      .take(FingerprintOps.WinnowTop)
    val got = FingerprintOps.q210(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == expected,
      s"got=${got.take(5)}... expected=${expected.take(5)}...")
    assert(got.nonEmpty, "the near-dup corpus must surface overlap pairs")
  }

  // ---------------------------------------------------------------- q208

  test("q208: a stopword-free source is the stylometric outlier; clones tie at equal delta") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_delta").toFile.getAbsolutePath
    val normal = "the cat sat of the mat and a dog in the house is here for now"
    val rows = Seq(
      (1L, normal, "en", "src_a", normal.length.toLong),
      (2L, normal, "en", "src_b", normal.length.toLong),
      (3L, "qqq www eee rrr ttt yyy uuu iii ooo ppp zzz xxx ccc vvv bbb",
        "en", "src_weird", 59L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = FingerprintOps.q208(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(out.map(_._1).toSet == Set("src_a", "src_b", "src_weird"))
    val delta = out.toMap
    assert(delta("src_a") == delta("src_b"),
      "identical profiles must tie exactly")
    assert(delta("src_weird") > delta("src_a"),
      "the function-word-free source must carry the largest delta")
    assert(out.head._1 == "src_weird", "output is ordered by delta desc")
  }

  test("q208 on the real corpus: complete source domain, non-negative deltas") {
    val out = FingerprintOps.q208(spark, sfDir).collect()
    val nSources = graft.Tables.table(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(out.length == nSources)
    assert(out.forall(_.getLong(2) >= 0L))
    assert(out.forall(_.getLong(1) > 0L))
  }
}

object FingerprintOpsSpec {
  /** Collect q206 as (source, hub, authority) triples. */
  def collectQ206(spark: SparkSession, dir: String): Seq[(String, Long, Long)] =
    GraphRank.q206(spark, dir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
}
