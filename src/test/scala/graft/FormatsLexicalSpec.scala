package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusHygieneOps, LexicalStats, SourceSink, TextAnalysis}

/** Semantic assertions for the q95-q100 pack — the DuckDB oracle gates
  * value equality; these pin the INVARIANTS that make the operators
  * right by construction (chunk coverage, quantized-score definitions,
  * funnel monotonicity, partition pruning on the ORC tree).
  */
class FormatsLexicalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("q96: chunks tile every document — count, stride, and width invariants") {
    import spark.implicits._
    val chunks = TextAnalysis.q96(spark, sfDir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("tok_sum"),
        max(col("chunk_id")).as("max_id"))
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), t -> t <> '')")).cast("long").as("n"))
    val joined = chunks.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nChunks, maxId, n) =
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("max_id"), r.getAs[Long]("n"))
      // starts are 0, S, 2S, ... ≤ n-1 → exactly floor((n-1)/S)+1 chunks
      assert(nChunks == (n - 1) / TextAnalysis.ChunkS + 1,
        s"doc ${r.getAs[Long]("doc_id")}: $nChunks chunks for $n tokens")
      assert(maxId == nChunks - 1, "chunk ids are dense from 0")
      // chunk k covers [kS, min(kS+W, n)) → summed widths telescope:
      // every token counted once per window that contains it; with
      // W = S + 8 each non-boundary token in a doc with c>1 chunks is
      // double-counted at most once per following window start
      val expected = (0L until nChunks).map { k =>
        math.min(n - k * TextAnalysis.ChunkS, TextAnalysis.ChunkW.toLong)
      }.sum
      assert(r.getAs[Long]("tok_sum") == expected, "per-chunk widths")
    }
  }

  test("q97: score is exactly tf * ((1e6 * N) div df) and ranks are top-3 per doc") {
    val out = LexicalStats.q97(spark, sfDir)
    val n = graft.Tables.table(spark, sfDir, "documents").count()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tf, df, score) = (r.getAs[Long]("tf"), r.getAs[Long]("df"),
        r.getAs[Long]("score"))
      assert(score == tf * ((1000000L * n) / df), s"quantized score for $r")
      assert(r.getAs[Long]("doc_id") % 10 == 0, "sampled docs only")
      assert(r.getAs[Long]("rn") >= 1 && r.getAs[Long]("rn") <= 3)
    }
  }

  test("q98: every pair meets the support floor and ratio_q is the exact integer ratio") {
    val rows = LexicalStats.q98(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (cab, ca, cb, ratio) = (r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"),
        r.getAs[Long]("c_b"), r.getAs[Long]("ratio_q"))
      assert(cab >= LexicalStats.PmiMinCount)
      assert(cab <= math.min(ca, cb), "a bigram can't outnumber its unigrams")
      assert(ratio == (1000000000L * cab) / (ca * cb))
    }
    // the cut is ordered: ratios are non-increasing down the list
    val ratios = rows.map(_.getAs[Long]("ratio_q")).toSeq
    assert(ratios == ratios.sorted.reverse)
  }

  test("q100: the funnel is monotone and stage 0 is the full corpus") {
    val rows = CorpusHygieneOps.q100(spark, sfDir).collect()
    val total = graft.Tables.table(spark, sfDir, "documents").count()
    assert(rows.head.getAs[Long]("stage") == 0L)
    assert(rows.head.getAs[Long]("n_docs") == total, "stage 0 = ingested corpus")
    val counts = rows.map(_.getAs[Long]("n_docs")).toSeq
    assert(counts == counts.sorted.reverse, s"funnel must shrink: $counts")
    assert(rows.length == 4, "all four stages present on the fixture corpus")
  }

  test("q95's ORC tree prunes partitions on a status predicate") {
    // q95 writes the partitioned tree as a side effect; build it, then
    // prove a status filter becomes a partition filter (file skipping),
    // not a row filter — the reason to partition the sink at all
    SourceSink.q95(spark, sfDir).collect()
    val out = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", "orc_rt").toString
    val pruned = spark.read.orc(out).filter(col("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("\\s", "").contains("o_orderstatus"),
      s"expected a partition filter on o_orderstatus in: $scan")
    assert(pruned.count() > 0)
  }
}
