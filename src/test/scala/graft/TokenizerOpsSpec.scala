package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TokenizerOps

/** q124 BPE pair counting: recompute both merge rounds from first
  * principles in plain Scala (regex tokenize -> word freqs -> top-W ->
  * pair weights -> merge -> recount) and compare row-for-row.
  */
class TokenizerOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def pairRound(wf: Seq[(String, Long)]): Seq[(String, Long, Long)] =
    wf.filter(_._1.length >= 2)
      .flatMap { case (w, f) => w.sliding(2).map(p => (p, w, f)) }
      .groupBy(_._1)
      .map { case (p, rows) =>
        (p, rows.map(_._3).sum, rows.map(_._2).distinct.length.toLong)
      }
      .toSeq
      .sortBy { case (p, wt, _) => (-wt, p) }
      .take(TokenizerOps.BpePairTop)

  test("q124 matches a first-principles Scala BPE pair count, both rounds") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").as[String].collect()

    val freqs = texts
      .flatMap(t => t.toLowerCase.split("[^a-z]+").filter(_.length >= 2))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val wf = freqs.sortBy { case (w, f) => (-f, w) }
      .take(TokenizerOps.BpeVocabWords)

    val r1 = pairRound(wf)
    val mergePair = r1.head._1
    val r2 = pairRound(wf.map { case (w, f) =>
      (w.replace(mergePair, "0"), f)
    })
    val expected =
      r1.map { case (p, wt, n) => (1, p, wt, n) } ++
        r2.map { case (p, wt, n) => (2, p, wt, n) }

    val got = TokenizerOps.q124(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("q129 matches a first-principles growth model over id-range buckets") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val lo = docs.map(_._1).min; val hi = docs.map(_._1).max
    val b = TokenizerOps.GrowthBuckets
    def bucket(id: Long): Long = math.min(b - 1L, (id - lo) * b / (hi - lo + 1))

    def firsts[K](pairs: Seq[(K, Long)]): Map[Long, Long] =
      pairs.groupBy(_._1).view.mapValues(_.map(_._2).min).values.toSeq
        .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val termFirsts = firsts(docs.flatMap { case (id, t) =>
      t.split(' ').filter(_.nonEmpty).map(_ -> id) }.toSeq)
    val shingleFirsts = firsts(docs.flatMap { case (id, t) =>
      ShingleModel.shingleSet(t).map(_ -> id) }.toSeq)
    val docCounts = docs.map(_._1).groupBy(bucket).view
      .mapValues(_.length.toLong).toMap

    val rows = TokenizerOps.q129(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
    var (dc, vc, sc) = (0L, 0L, 0L)
    rows.foreach { r =>
      val bk = r.getLong(0)
      assert(r.getAs[Long]("n_docs") == docCounts.getOrElse(bk, 0L))
      assert(r.getAs[Long]("new_terms") == termFirsts.getOrElse(bk, 0L))
      assert(r.getAs[Long]("new_shingles") == shingleFirsts.getOrElse(bk, 0L))
      dc += r.getAs[Long]("n_docs"); vc += r.getAs[Long]("new_terms")
      sc += r.getAs[Long]("new_shingles")
      assert(r.getAs[Long]("docs_cum") == dc &&
        r.getAs[Long]("vocab_cum") == vc &&
        r.getAs[Long]("shingles_cum") == sc, s"cumulative drift at $bk")
    }
    assert(dc == docs.length.toLong, "every doc lands in exactly one bucket")
    assert(sc == docs.flatMap(d => ShingleModel.shingleSet(d._2)).distinct.length,
      "final shingles_cum is the whole distinct shingle domain")
  }

  test("round 2 reflects the applied merge: the winning pair is gone") {
    val rows = TokenizerOps.q124(spark, sfDir).collect()
    val r1 = rows.filter(_.getInt(0) == 1)
    val r2 = rows.filter(_.getInt(0) == 2)
    assert(r1.nonEmpty && r2.nonEmpty)
    val winner = r1.head.getString(1)
    assert(!r2.exists(_.getString(1) == winner),
      s"merged pair '$winner' must not survive into round 2")
    assert(rows.forall(_.getString(1).length == 2), "pairs are 2 symbols")
    assert(rows.forall(_.getLong(2) > 0L))
  }

  test("q218 matches a first-principles greedy BPE trainer") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text").as[String].collect()
    val wf = texts
      .flatMap(t => t.toLowerCase.split("[^a-z]+").filter(_.length >= 2))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, f) => (-f, w) }
      .take(TokenizerOps.BpeVocabWords)

    // greedy left-to-right merge application (Sennrich's rule): consume
    // both symbols on a match so a just-merged token can't re-merge
    def applyMerge(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r =>
          (l + r) :: applyMerge(rest, l, r)
        case a :: rest => a :: applyMerge(rest, l, r)
        case Nil => Nil
      }

    var words = wf.map { case (w, f) => (w.map(_.toString).toList, f) }
    val expected = (1 to TokenizerOps.BpeMergeRounds).map { step =>
      val counts = words
        .flatMap { case (s, f) =>
          s.zip(s.drop(1)).map { case (a, b) => ((a, b), f) }
        }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val ((l, r), w) =
        counts.minBy { case ((a, b), wt) => (-wt, a, b) }
      words = words.map { case (s, f) => (applyMerge(s, l, r), f) }
      (step, l, r, w)
    }

    val got = TokenizerOps.q218(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // merge-of-merge must actually occur within 6 rounds on this corpus
    // for the multi-char symbol representation to be exercised
    val learned = expected.map { case (_, l, r, _) => l + r }
    assert(expected.exists { case (_, l, r, _) =>
      l.length > 1 || r.length > 1 },
      s"no multi-char symbol in any learned merge: $learned")
  }

  test("q220 matches a first-principles dictionary encode with the learned merges") {
    import spark.implicits._

    def applyMerge(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r =>
          (l + r) :: applyMerge(rest, l, r)
        case a :: rest => a :: applyMerge(rest, l, r)
        case Nil => Nil
      }

    val merges = TokenizerOps.q218(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    def encode(w: String): List[String] =
      merges.foldLeft(w.map(_.toString).toList) {
        case (s, (l, r)) => applyMerge(s, l, r)
      }

    val wfl = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"lang", $"text").as[(String, String)].collect()
      .flatMap { case (lang, t) =>
        t.toLowerCase.split("[^a-z]+").filter(_.length >= 2)
          .map(w => (lang, w))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq

    val expected = wfl.groupBy(_._1._1).map { case (lang, entries) =>
      val encs = entries.map { case ((_, w), f) => (w, f, encode(w)) }
      lang -> ((
        entries.map(_._2).sum,
        encs.map { case (_, f, e) => f * e.length }.sum,
        encs.map { case (w, f, _) => f * w.length }.sum,
        encs.flatMap(_._3).toSet.size.toLong))
    }

    val got = TokenizerOps.q220(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (nw, nt, nc, types) = expected(r.getString(0))
      assert(r.getLong(1) == nw, s"n_words(${r.getString(0)})")
      assert(r.getLong(2) == nt, s"n_tokens(${r.getString(0)})")
      assert(r.getLong(3) == nc, s"n_chars(${r.getString(0)})")
      assert(r.getLong(4) == types, s"n_token_types(${r.getString(0)})")
      assert(r.getLong(5) == 1000L * nt / nc, s"tokens_per_mille")
      // the learned tokenizer must actually compress the dictionary
      assert(nt < nc, s"no compression for ${r.getString(0)}")
    }
  }
}
