package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusHygieneOps, EmbeddingOps, MixtureOps, RetrievalOps}

/** Semantic assertions for the q101-q105 pack — the DuckDB oracle gates
  * value equality; these pin the invariants behind each operator: the
  * tiling alignment guarantee (q101), quota semantics + determinism +
  * the WindowGroupLimit shuffle bound (q102/q104), recall-metric bounds
  * (q103), posting-list shape (q104), and the quantized BM25 ranking
  * contract (q105).
  */
class RetrievalPrimitivesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private val sfDir01 = "/root/testdata/sf0.01"

  test("q101: a misaligned shared run is caught with exactly L-W+1 colliding windows") {
    import spark.implicits._
    val w = CorpusHygieneOps.RpW
    // doc 1 carries a (2W-1)-token run at offset 0; doc 2 embeds the
    // SAME run at offset W-1 — the misalignment that refuted the
    // tiling draft of this query. Stride-1 windows are offset-blind:
    // a run of L = 2W-1 tokens yields exactly L-W+1 = W shared window
    // hashes, each occurring once per copy.
    val run = (0 until 2 * w - 1).map(i => s"run$i")
    val doc1 = run.mkString(" ")
    val doc2 = ((0 until w - 1).map(i => s"pre$i") ++ run).mkString(" ")
    val noise = (0 until 3 * w).map(i => s"n$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("q101fix").toString
    Seq((1L, doc1, "en", "srcA", doc1.length.toLong),
      (2L, doc2, "en", "srcB", doc2.length.toLong),
      (3L, noise, "en", "srcC", noise.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusHygieneOps.q101(spark, dir).collect()
    assert(out.length == w,
      s"expected exactly $w shared windows, got ${out.length}")
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2L)
      assert(r.getAs[Long]("n_occ") == 2L)
      assert(r.getAs[Long]("first_doc") == 1L)
    }
  }

  test("q101: report is ordered by occurrence and capped at 50") {
    val rows = CorpusHygieneOps.q101(spark, sfDir01).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val occ = rows.map(_.getAs[Long]("n_occ")).toSeq
    assert(occ == occ.sorted.reverse, "top passages first")
    rows.foreach(r => assert(r.getAs[Long]("n_docs") >= 2))
  }

  test("q102: quota semantics — n_kept = min(quota, n_total), deterministic reruns") {
    val rows = MixtureOps.q102(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, kept) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(kept == math.min(MixtureOps.MixQuota.toLong, total),
        s"source ${r.getAs[String]("source")}: kept $kept of $total")
      assert(r.getAs[Long]("kept_tok_sum") <= r.getAs[Long]("tok_total"))
    }
    // hash-rank selection is a pure function of doc ids — reruns agree
    val again = MixtureOps.q102(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q102/q104: the quota rank plans with WindowGroupLimit pushdown") {
    for (df <- Seq(MixtureOps.q102(spark, sfDir),
        RetrievalOps.q104(spark, sfDir))) {
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"rank ≤ cap must push a partial group limit below the exchange:\n$plan")
    }
  }

  test("q103: recall metrics respect their definitions and find real hits") {
    val rows = EmbeddingOps.q103(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cand, hits, pct) = (r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_pct"))
      assert(hits <= cand, "a hit is a candidate by definition")
      assert(hits <= EmbeddingOps.RecallK, "hits bounded by k")
      assert(pct == hits * 100 / EmbeddingOps.RecallK)
      assert(r.getAs[Long]("probe_id") % 20 == 0)
    }
    assert(rows.map(_.getAs[Long]("n_hits")).sum > 0,
      "the index must find at least one true neighbor on the fixture corpus")
  }

  test("q104: posting lists are sorted prefixes of length min(cap, df)") {
    val rows = RetrievalOps.q104(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      // output contract: the posting column is a scalar string (so every
      // row-set comparator can hash it); the array-form invariants are
      // pinned against its split
      val posting =
        r.getAs[String]("posting").split(' ').toSeq.map(_.toLong)
      assert(df >= RetrievalOps.IdxMinDf)
      assert(posting.length ==
        math.min(RetrievalOps.IdxPostCap.toLong, df).toInt)
      assert(posting == posting.sorted, "ascending doc ids")
      assert(posting.distinct.length == posting.length, "no duplicate docs")
    }
  }

  test("q105: quantized BM25 — scores rank the cut, every term contributes") {
    val rows = RetrievalOps.q105(spark, sfDir01).collect()
    assert(rows.nonEmpty && rows.length <= RetrievalOps.BmK)
    val scores = rows.map(_.getAs[Long]("score")).toSeq
    assert(scores == scores.sorted.reverse, "descending scores")
    rows.foreach { r =>
      assert(r.getAs[Long]("score") > 0)
      assert(r.getAs[Long]("n_terms") >= 1 &&
        r.getAs[Long]("n_terms") <= RetrievalOps.BmTerms.size)
    }
  }

  test("q105: the integer score matches the BM25 rational for a hand-checked doc") {
    // recompute the top doc's score from raw counts with independent
    // arithmetic — pins the cleared-fraction formula itself, not just
    // its cross-engine agreement
    val top = RetrievalOps.q105(spark, sfDir01).collect().head
    val docs = graft.Tables.table(spark, sfDir01, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val all = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
      .filter(col("t").isin(RetrievalOps.BmTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("t")).count()
      .collect()
    val nDocs = docs.count()
    val avgdl = docs.agg(sum(col("dl"))).head.getLong(0) / nDocs
    val dfByTerm = all.groupBy(_.getAs[String]("t")).map { case (t, rs) =>
      t -> rs.map(_.getAs[Long]("doc_id")).distinct.length.toLong
    }
    val expected = all.filter(_.getAs[Long]("doc_id") == top.getAs[Long]("doc_id"))
      .map { r =>
        val (tf, dl) = (r.getAs[Long]("count"), r.getAs[Long]("dl"))
        val idfQ = (10000L * nDocs) / dfByTerm(r.getAs[String]("t"))
        (22L * tf * avgdl * idfQ) / (10L * avgdl * tf + 3L * avgdl + 9L * dl)
      }.sum
    assert(top.getAs[Long]("score") == expected,
      s"doc ${top.getAs[Long]("doc_id")}: engine ${top.getAs[Long]("score")} vs hand $expected")
  }

  test("q126: phrase hits match a first-principles Scala positional scan") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val docPairs = texts.map { case (id, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      // 1-based position of the bigram's first token, post-filter
      id -> toks.sliding(2).zipWithIndex.collect {
        case (Array(a, b), i) => ((a, b), (i + 1).toLong)
      }.toSeq
    }
    val counts = docPairs.flatMap(_._2.map(_._1))
      .groupBy(identity).view.mapValues(_.size).toSeq
    val phrase = counts
      .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    val expected = docPairs
      .map { case (id, ps) =>
        val hits = ps.filter(_._1 == phrase)
        (id, hits.length.toLong, if (hits.isEmpty) 0L else hits.map(_._2).min)
      }
      .filter(_._2 > 0)
      .sortBy { case (id, n, _) => (-n, id) }
      .take(RetrievalOps.PhraseTop).toSeq

    val got = RetrievalOps.q126(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected,
      s"phrase $phrase: engine ${got.take(3)} vs scala ${expected.take(3)}")
  }
}
