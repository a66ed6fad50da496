package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EmbeddingOps, ReleaseOps, TextAnalysis}

/** Semantic assertions for the q110-q111 pack: vote/holdout hygiene for
  * label propagation and span alignment for KWIC extraction.
  */
class HoldoutKwicSnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir01 = "/root/testdata/sf0.01"

  test("q110: predictions cover only the held-out set, with valid votes") {
    val rows = EmbeddingOps.q110(spark, sfDir01).collect()
    assert(rows.nonEmpty, "the LSH graph must connect some held-out vectors")
    val labelDomain = graft.Tables.table(spark, sfDir01, "embeddings")
      .select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 5 == 3, "only held-out vectors get predictions")
      assert(r.getAs[Long]("n_votes") >= 1)
      assert(labelDomain.contains(r.getAs[Long]("pred_label")),
        "a propagated label must exist in the corpus")
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[Long]("pred_label") == r.getAs[Long]("true_label")))
    }
    // the vote is a pure function of the corpus — reruns agree
    val again = EmbeddingOps.q110(spark, sfDir01).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q113: statuses partition the union of snapshots with exact counts") {
    val ids = graft.Tables.table(spark, sfDir01, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expected = Map(
      "added" -> ids.count(_ % 17 == 0).toLong,
      "removed" -> ids.count(_ % 13 == 0).toLong,
      "changed" -> ids.count(i => i % 13 != 0 && i % 7 == 0).toLong,
      "unchanged" -> ids.count(i => i % 13 != 0 && i % 7 != 0).toLong)
    val got = graft.queries.ReleaseOps.q113(spark, sfDir01).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_docs")).toMap
    assert(got == expected.filter(_._2 > 0),
      s"diff must classify every id exactly once: got $got expected $expected")
  }

  test("q111: every span is anchored on the needle with a tight context") {
    import spark.implicits._
    val rows = TextAnalysis.q111(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    val toksByDoc = graft.Tables.table(spark, sfDir01, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    perDoc.foreach { case (_, rs) =>
      assert(rs.length <= TextAnalysis.KwicPerDoc, "per-doc cap")
    }
    rows.foreach { r =>
      val (doc, pos, ctx) = (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[String]("context"))
      val toks = toksByDoc(doc)
      assert(toks(pos.toInt) == TextAnalysis.KwicNeedle, s"pos must point at the needle in doc $doc")
      val ctxToks = ctx.split(" ").toSeq
      assert(ctxToks.length <= 2 * TextAnalysis.KwicCtx + 1)
      assert(ctxToks.contains(TextAnalysis.KwicNeedle))
      // the context is exactly the corpus tokens around pos
      val s = math.max(0, pos.toInt - TextAnalysis.KwicCtx)
      val e = math.min(toks.length - 1, pos.toInt + TextAnalysis.KwicCtx)
      assert(ctxToks == toks.slice(s, e + 1), s"context window mismatch in doc $doc@$pos")
    }
  }
}
