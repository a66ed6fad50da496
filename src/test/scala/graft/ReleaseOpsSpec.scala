package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ReleaseOps, ReleaseOps => P9}

/** Pins the release-hygiene invariants behind q114-q116: split
  * assignment is exhaustive/deterministic and its per-mille audit adds
  * up, the incremental-dedup statuses partition snapshot B against
  * independently-computed content membership, and the OOV audit's
  * vocabulary is the exact top-k with consistent token accounting.
  */
class ReleaseOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private val sfDir01 = "/root/testdata/sf0.01"

  test("q114: splits partition every lang and the permille audit adds up") {
    val rows = P9.q114(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    val corpus = graft.Tables.table(spark, sfDir01, "documents")
    val langTotals = corpus.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet == langTotals.keySet, "every lang is audited")
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs")).sum == langTotals(lang),
        s"splits must partition lang $lang")
      val permilles = rs.map(_.getAs[Long]("share_permille"))
      assert(permilles.forall(p => p >= 0 && p <= 1000))
      // floor division loses at most (splits-1) per-mille total
      assert(permilles.sum <= 1000 && permilles.sum >= 1000 - rs.length + 1,
        s"permille audit must add up for $lang, got ${permilles.sum}")
      rs.foreach { r =>
        assert(Set("train", "val", "test")(r.getAs[String]("split")))
      }
    }
    // assignment is a pure function of doc_id — reruns agree exactly
    val again = P9.q114(spark, sfDir01).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q114: the split is a pure function of doc_id — edits cannot move a doc") {
    import spark.implicits._
    val v1 = (0L until 2000L).map(i => (i, s"original text $i"))
      .toDF("doc_id", "text")
    val v2 = (0L until 2000L).map(i => (i, s"completely rewritten $i v2"))
      .toDF("doc_id", "text")
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.select(col("doc_id"), P9.splitOf(col("doc_id")).as("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (s1, s2) = (assign(v1), assign(v2))
    assert(s1 == s2, "re-crawled/edited docs must keep their split")
    // and the buckets actually use the whole domain: all three splits
    // appear, in roughly the configured 900/50/50 proportion
    val dist = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(dist.keySet == Set("train", "val", "test"))
    assert(dist("train") > dist("val") && dist("train") > dist("test"))
  }

  test("q115: statuses partition snapshot B against real content membership") {
    val rows = P9.q115(spark, sfDir01).collect()
    val got = rows.map(r => r.getAs[String]("status") ->
      r.getAs[Long]("n_docs")).toMap
    val a = ReleaseOps.snapshotA(spark, sfDir01)
    val b = ReleaseOps.snapshotB(spark, sfDir01)
    assert(got.values.sum == b.count(), "statuses must partition B")
    // independent recomputation from the snapshot frames themselves
    val sameId = b.join(a, b("doc_id") === a("doc_id") &&
      b("fp_b") === a("fp_a"), "left_semi").count()
    val inA = b.join(a.select(col("fp_a").as("fp_b")).distinct(),
      Seq("fp_b"), "left_semi").count()
    assert(got.getOrElse("dup_same_id", 0L) == sameId)
    assert(got.getOrElse("dup_other_id", 0L) == inA - sameId)
    assert(got.getOrElse("novel", 0L) == b.count() - inA)
    // the derived release guarantees all three statuses are non-empty:
    // %7-edited docs are novel, untouched docs are same-id dups
    assert(got.getOrElse("dup_same_id", 0L) > 0)
    assert(got.getOrElse("novel", 0L) > 0)
  }

  test("q117: bins partition both snapshots and drift obeys the TVD identity") {
    val rows = P9.q117(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    val corpus = graft.Tables.table(spark, sfDir01, "documents")
    val nA = corpus.count()
    val nB = ReleaseOps.snapshotB(spark, sfDir01).count()
    assert(rows.map(_.getAs[Long]("n_a")).sum == nA,
      "A histogram must partition snapshot A")
    assert(rows.map(_.getAs[Long]("n_b")).sum == nB,
      "B histogram must partition snapshot B")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(bin >= 0 && bin < P9.DriftBins)
      val (sa, sb) = (r.getAs[Long]("share_a_permille"),
        r.getAs[Long]("share_b_permille"))
      assert(sa == 1000 * r.getAs[Long]("n_a") / nA)
      assert(sb == 1000 * r.getAs[Long]("n_b") / nB)
      assert(r.getAs[Long]("drift_permille") == math.abs(sa - sb))
    }
    // total variation distance = sum(drift)/2 is a valid distance
    val tvd = rows.map(_.getAs[Long]("drift_permille")).sum / 2
    assert(tvd >= 0 && tvd <= 1000)
  }

  test("q118: per-lang overlap counts are set-exact and Jaccard is the floor ratio") {
    val rows = P9.q118(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    // independent recomputation of one lang's overlap from raw fp sets
    val a = ReleaseOps.snapshotA(spark, sfDir01)
    val docsLang = graft.Tables.table(spark, sfDir01, "documents")
      .select(col("doc_id"), col("lang"))
    val aSets = a.join(docsLang, "doc_id")
      .select(col("lang"), col("fp_a")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    // snapshot B keeps the base doc's lang; new ids are -id-1 of a %17 base doc
    val bSets = ReleaseOps.snapshotB(spark, sfDir01)
      .withColumn("base_id",
        when(col("doc_id") < 0, -col("doc_id") - 1).otherwise(col("doc_id")))
      .join(docsLang.withColumnRenamed("doc_id", "base_id"), "base_id")
      .select(col("lang"), col("fp_b")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (na, nb, ni) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_inter"))
      assert(na == aSets(lang).size.toLong, s"n_a mismatch for $lang")
      assert(nb == bSets(lang).size.toLong, s"n_b mismatch for $lang")
      assert(ni == (aSets(lang) & bSets(lang)).size.toLong,
        s"n_inter mismatch for $lang")
      assert(r.getAs[Long]("jaccard_permille") == 1000 * ni / (na + nb - ni))
    }
  }

  test("q119: drift equals an independent recomputation from raw vectors") {
    val rows = P9.q119(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // recompute from first principles: quantize, derive release B,
    // truncated-quotient means, exact integer squared-L2
    val vecs = graft.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        expr(s"transform(embedding, e -> cast(floor(cast(e as double) * ${P9.EmbQScale}) as bigint))"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val dims = vecs.head._3.length
    def meanByDim(side: Seq[(Long, Array[Long])]): Array[Long] =
      Array.tabulate(dims) { d =>
        val s = side.map(_._2(d)).sum
        s / side.length  // Scala / on Long truncates toward zero, as div
      }
    val expected = vecs.map(_._2).distinct.sorted.map { label =>
      val a = vecs.filter(_._2 == label).map(v => (v._1, v._3)).toSeq
      val b = vecs.filter(v => v._2 == label && v._1 % 11 != 0).map { v =>
        val arr = v._3.clone()
        if (v._1 % 9 == 0) arr((v._1 % 64).toInt) += P9.EmbQScale / 4
        (v._1, arr)
      }.toSeq
      val (ma, mb) = (meanByDim(a), meanByDim(b))
      val shift = (0 until dims).map(d => (ma(d) - mb(d)) * (ma(d) - mb(d))).sum
      (label, a.length.toLong, b.length.toLong, shift)
    }
    val got = rows.map(r => (r.getAs[Long]("label"), r.getAs[Long]("n_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("shift_sq"))).toSeq
    assert(got == expected.toSeq)
    // the re-embedded dimension must actually move some label's centroid
    assert(rows.map(_.getAs[Long]("shift_sq")).sum > 0)
  }

  test("q119: a label whose vectors are all deprecated is dropped, not a crash") {
    import spark.implicits._
    // label 7's only vectors carry %11 ids -> release B has no centroid
    // for it; ANSI `div 0` would throw without the n_b > 0 guard
    val dir = java.nio.file.Files.createTempDirectory("q119-edge").toString
    val rows = Seq(
      (11L, 7, Array.fill(64)(0.5f)),
      (22L, 7, Array.fill(64)(0.25f)),
      (1L, 3, Array.fill(64)(1.0f)),
      (2L, 3, Array.fill(64)(0.75f)))
    rows.toDF("vec_id", "label", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    try {
      val out = P9.q119(spark, dir).collect()
      assert(out.map(_.getAs[Long]("label")).toSet == Set(3L),
        "the all-deprecated label must be absent, the healthy one present")
      assert(out.forall(_.getAs[Long]("n_b") > 0))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("q120: leakage equals an independent set recomputation") {
    val rows = P9.q120(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.table(spark, sfDir01, "documents")
      .select(col("lang"), graft.functions.CrossHash.h60(col("text")).as("fp"),
        P9.splitOf(col("doc_id")).as("split"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val trainFps = docs.collect { case (_, fp, "train") => fp }.toSet
    val test = docs.filter(_._3 == "test")
    val expected = test.groupBy(_._1).map { case (lang, ds) =>
      val leaked = ds.count(d => trainFps(d._2)).toLong
      (lang, ds.length.toLong, leaked, 1000 * leaked / ds.length)
    }.toSet
    val got = rows.map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_test"),
      r.getAs[Long]("n_leaked"), r.getAs[Long]("leak_permille"))).toSet
    assert(got == expected)
    rows.foreach(r => assert(r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_test")))
  }

  test("q121: novelty equals an independent shingle-set recomputation") {
    val rows = P9.q121(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // first-principles model: tokenize, slide 5-grams, md5-h60 hash —
    // the shared ShingleModel, one copy across the re-deriving specs
    def shingleSet(text: String): Set[Long] = ShingleModel.shingleSet(text)
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val aSet = docs.flatMap(d => shingleSet(d._3)).toSet
    val bDocs = docs.filter(_._1 % 13 != 0)
      .map { case (id, l, t) => (l, if (id % 7 == 0) t + " v2" else t) } ++
      docs.filter(_._1 % 17 == 0).map { case (_, l, t) => (l, "new:" + t) }
    val expected = bDocs.groupBy(_._1).view.mapValues { ds =>
      val perDoc = ds.map(d => shingleSet(d._2))
      val n = perDoc.map(_.size.toLong).sum
      val novel = perDoc.map(_.count(h => !aSet(h)).toLong).sum
      (n, novel, if (n == 0) 0L else 1000 * novel / n)
    }.toMap.filter(_._2._1 > 0)
    val got = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
        r.getAs[Long]("novelty_permille"))).toMap
    assert(got == expected, "q121 disagrees with the shingle-set model")
    // the ' v2' edits and 'new:' docs guarantee some novelty
    assert(rows.map(_.getAs[Long]("n_novel")).sum > 0)
  }

  test("q116: vocabulary is the exact top-k and token accounting is consistent") {
    val rows = P9.q116(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, pm) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("oov_permille"))
      assert(oov >= 0 && oov <= n)
      assert(pm == 1000 * oov / n, "permille must be the exact floor ratio")
    }
    // per-lang token totals must equal an independent token count
    val totals = graft.Tables.table(spark, sfDir01, "documents")
      .select(col("lang"),
        expr("size(filter(split(text, ' '), t -> t <> ''))").as("n"))
      .groupBy(col("lang")).agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getAs[String]("lang") ->
      r.getAs[Long]("n_tokens")).toMap == totals)
    // a corpus-frequency top-k vocabulary covers the bulk of tokens:
    // every lang's OOV rate stays below half
    rows.foreach(r => assert(r.getAs[Long]("oov_permille") < 500,
      s"vocab of ${P9.VocabSize} should cover most tokens"))
  }

  test("q130: embedding CDC counts follow the id-rule model exactly") {
    import org.apache.spark.sql.functions.col
    val ids = graft.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val rows = P9.q130(spark, sfDir).collect()
    val byLabel = ids.groupBy(_._2)
    assert(rows.length == byLabel.size)
    val shift = P9.EmbQScale / 4
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      val vecs = byLabel(l).map(_._1)
      val dropped = vecs.count(_ % 11 == 0).toLong
      val changed = vecs.count(v => v % 11 != 0 && v % 9 == 0).toLong
      assert(r.getAs[Long]("n_a") == vecs.length.toLong)
      assert(r.getAs[Long]("n_dropped") == dropped)
      assert(r.getAs[Long]("n_b") == vecs.length - dropped)
      assert(r.getAs[Long]("n_changed") == changed)
      assert(r.getAs[Long]("n_unchanged") == vecs.length - dropped - changed)
      // a single-dim +shift perturbation shifts squared-L2 by exactly
      // shift^2; labels with no surviving perturbed vector read 0
      val expectedMax = if (changed > 0) shift * shift else 0L
      assert(r.getAs[Long]("max_dist_sq") == expectedMax,
        s"label $l: max shift ${r.getAs[Long]("max_dist_sq")}")
    }
  }

  test("q128: outlier distances equal a first-principles quantized recompute") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(e => math.floor(e.toDouble * P9.EmbQScale).toLong)))

    val cent = vecs.flatMap { case (_, l, q) => q.zipWithIndex.map {
        case (x, d) => ((l, d), x) } }
      .groupBy(_._1).view
      .mapValues(xs => xs.map(_._2).sum / xs.length) // Long / truncates like div
      .toMap
    val expected = vecs
      .map { case (id, l, q) =>
        val d2 = q.zipWithIndex.map { case (x, d) =>
          val m = cent((l, d)); (x - m) * (x - m) }.sum
        (id, l, d2)
      }
      .sortBy { case (id, _, d) => (-d, id) }
      .take(P9.OutlierTop).toSeq

    val got = P9.q128(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"engine ${got.take(3)} vs model ${expected.take(3)}")
    assert(got.nonEmpty && got.head._3 > 0, "top outlier has positive distance")
  }
}
