package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity4

/** q170 (SemDeDup verdict) / q171 (pruning curve): fixtures the oracle
  * gate cannot provide — an exact-twin pair where the HIGHER id must be
  * the one dropped (keep-lowest-id policy), a near-twin that must also
  * drop, orthogonal vectors that must all survive, plus cross-query and
  * monotonicity invariants on the real corpus.
  */
class Similarity4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  /** 12 16-dim vectors: ids 0-9 are scaled standard-basis directions
    * (pairwise cosine 0), id 10 is an EXACT copy of id 3's vector, and
    * id 11 is a near-copy of id 5 (cosine ≈ 0.9997). With τ = 0.40
    * exactly ids 10 and 11 are semantic duplicates, and each must be
    * dropped in favor of its lower-id twin.
    */
  private lazy val twinDir: String = {
    val dir = Files.createTempDirectory("graft_semdedup").toFile.getAbsolutePath
    import spark.implicits._
    def basis(axis: Int, scale: Float): Array[Float] = {
      val v = Array.fill(16)(0f); v(axis) = scale; v
    }
    val near5 = {
      val v = basis(5, 2.0f); v(6) = 0.05f; v // cos ≈ 0.9997 with id 5
    }
    val rows = (0 to 9).map(i => (i.toLong, basis(i, 1.5f + 0.1f * i), i)) ++
      Seq((10L, basis(3, 0.7f), 10), (11L, near5, 11))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  // ------------------------------------------------------- adaptive k

  test("kForCorpus: cluster count grows with the corpus, floor 8, constant expected block size") {
    import graft.queries.Similarity
    // floor regime: tiny corpora keep the readable k=8
    assert(Similarity.kForCorpus(12) == 8)
    assert(Similarity.kForCorpus(500) == 8)
    assert(Similarity.kForCorpus(1599) == 8)
    // adaptive regime: k = n div KmDocsPerCluster
    assert(Similarity.kForCorpus(2000) == 10)
    assert(Similarity.kForCorpus(20000) == 100)
    assert(Similarity.kForCorpus(1000000) == 5000)
    // the scale claim itself: expected block size n/k is bounded by
    // KmDocsPerCluster(1 + 1/k) for every n past the floor regime, so
    // the within-cluster pair pass stays LINEAR in the corpus
    for (n <- Seq(2000L, 20000L, 123457L, 10000000L)) {
      val k = Similarity.kForCorpus(n)
      assert(n.toDouble / k <= Similarity.KmDocsPerCluster * 2,
        s"expected block size ${n / k} at n=$n k=$k")
    }
  }

  // ---------------------------------------------------------------- q170

  test("q170: exact twin and near-twin drop; keep-lowest-id holds") {
    val rows = Similarity4.q170(spark, twinDir).collect()
    assert(rows.map(_.getLong(1)).sum == 12L, "membership must cover the corpus")
    assert(rows.map(_.getLong(2)).sum == 2L,
      s"exactly the two twins drop: ${rows.mkString(";")}")
    val droppedIds = rows.filter(_.getLong(2) > 0).map(_.getLong(4)).toSet
    assert(droppedIds == Set(10L, 11L),
      s"the HIGHER id of each twin pair must be the drop: $droppedIds")
  }

  test("q170: orthogonal-only corpus drops nothing") {
    val dir = Files.createTempDirectory("graft_ortho").toFile.getAbsolutePath
    import spark.implicits._
    (0 to 9).map { i =>
      val v = Array.fill(16)(0f); v(i) = 1f; (i.toLong, v, i)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity4.q170(spark, dir).collect()
    assert(rows.map(_.getLong(2)).sum == 0L)
    assert(rows.forall(_.getLong(4) == -1L),
      "duplicate-free clusters must carry the -1 sentinel")
  }

  test("q170: drop counts and permilles are consistent on the real corpus") {
    val rows = Similarity4.q170(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == 500L)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000 / r.getLong(1),
        s"permille must be the integer ratio: $r")
    }
  }

  // ---------------------------------------------------------------- q171

  test("q171: curve is monotone non-increasing and agrees with q170 at τ=400") {
    val curve = Similarity4.q171(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = curve.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
      s"raising τ can only drop fewer docs: $curve")
    val q170Drops = Similarity4.q170(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    assert(curve(400L) == q170Drops,
      "q171's τ=400 point must equal q170's total drop count")
  }

  // ---------------------------------------------------------------- q211

  test("q211 equals a first-principles nprobe sweep over the collected trained index") {
    import org.apache.spark.sql.functions._
    import graft.queries.Similarity
    val clusters = Similarity.kmClusters(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    val cents = Similarity.kmCentroids(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * Similarity.KmScale).toLong)
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i); i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    def micro(x: Double): Long = math.floor(x * 1000000d).toLong
    val byId = clusters.map(c => c._1 -> c).toMap
    val probes = (10L to 14L).map(byId)
    def top3(from: Array[Float], cands: Seq[(Long, Array[Float])]): Set[Long] =
      cands.map { case (id, e) => (micro(cos(from, e)), id) }
        .sortBy { case (sm, id) => (-sm, id) }.take(3).map(_._2).toSet
    val gt = probes.map { case (pid, pe, _) =>
      pid -> top3(pe, clusters.collect { case (id, e, _) if id != pid => (id, e) })
    }.toMap
    val expected = Seq(1, 2, 4).map { np =>
      var nCands = 0L; var nHits = 0L
      probes.foreach { case (pid, pe, _) =>
        val pq = quant(pe)
        val ranked = cents.toSeq.map { case (cid, cq) =>
          (pq.zip(cq).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.sortBy { case (d, cid) => (d, cid) }.take(np).map(_._2).toSet
        val cands = clusters.collect {
          case (id, e, cl) if id != pid && ranked(cl) => (id, e)
        }.toSeq
        nCands += cands.size
        nHits += (top3(pe, cands) & gt(pid)).size
      }
      (np.toLong, nCands, nHits, 1000 * nHits / 15)
    }
    val got = Similarity4.q211(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == expected, s"got=$got expected=$expected")
    // the curve the query exists for: candidates and recall are
    // monotone non-decreasing in nprobe
    assert(got.map(_._2) == got.map(_._2).sorted)
    assert(got.map(_._3) == got.map(_._3).sorted)
  }

  test("q224 equals a first-principles MRR eval over the collected trained index") {
    import org.apache.spark.sql.functions._
    import graft.queries.Similarity
    val clusters = Similarity.kmClusters(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    val cents = Similarity.kmCentroids(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * Similarity.KmScale).toLong)
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i); i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    def micro(x: Double): Long = math.floor(x * 1000000d).toLong
    val byId = clusters.map(c => c._1 -> c).toMap
    val expected = (20L to 29L).map(byId).map { case (pid, pe, _) =>
      val gtNid = clusters.collect { case (id, e, _) if id != pid =>
        (micro(cos(pe, e)), id)
      }.sortBy { case (sm, id) => (-sm, id) }.head._2
      val pq = quant(pe)
      val probed = cents.toSeq.map { case (cid, cq) =>
        (pq.zip(cq).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.sortBy { case (d, cid) => (d, cid) }.take(2).map(_._2).toSet
      val ranked = clusters.collect {
        case (id, e, cl) if id != pid && probed(cl) => (micro(cos(pe, e)), id)
      }.sortBy { case (sm, id) => (-sm, id) }.map(_._2)
      val rank = ranked.indexOf(gtNid) + 1 // 0 → missed
      (pid, gtNid, rank.toLong, if (rank == 0) 0L else 1000000L / rank)
    }
    val got = Similarity4.q224(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == expected, s"got=$got expected=$expected")
    // reciprocal rank is the rank's inverse exactly when found
    got.foreach { case (_, _, rank, rr) =>
      if (rank > 0) assert(rr == 1000000L / rank) else assert(rr == 0L)
    }
  }

  test("q204: every reported pair is mutually top-1, margins non-negative, at most min(|A|,|B|) rows") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) { dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i); i += 1 }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val aIds = emb.keys.filter(_ < 40).toSeq.sorted
    val bIds = emb.keys.filter(i => i >= 100 && i < 140).toSeq.sorted
    def micro(x: Double): Long = math.floor(x * 1000000d).toLong
    def top1(from: Long, cands: Seq[Long]): Long =
      cands.map(c => (micro(cos(emb(from), emb(c))), c))
        .maxBy { case (sm, c) => (sm, -c) }._2
    val rows = Similarity4.q204(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= math.min(aIds.length, bIds.length))
    rows.foreach { r =>
      val (a, b, margin) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(top1(a, bIds) == b, s"$b is not $a's top-1")
      assert(top1(b, aIds) == a, s"$a is not $b's top-1")
      assert(margin >= 0L, s"negative margin for ($a,$b)")
    }
  }
}
