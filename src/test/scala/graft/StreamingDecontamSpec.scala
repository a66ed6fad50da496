package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDecontam

/** Streaming 13-gram decontamination: per-batch verdicts against a
  * static train gram set must equal q166's batch rule — same gram
  * construction, same threshold, bit-identical permilles — and each doc
  * is flagged exactly once, in the batch it arrives in.
  */
class StreamingDecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("per-batch verdicts match the q166 batch rule, exactly once per doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val trainToks = (1 to 40).map(i => s"w$i")
    val train = Seq((100L, trainToks.mkString(" ")))
      .toDF("doc_id", "text")
    val trainGrams = StreamingDecontam.trainGramSet(train).cache()
    assert(trainGrams.count() == 28, "40 tokens -> 28 distinct 13-grams")

    // doc 1: 30-token prefix of train + 10 novel -> 18/28 grams hit
    //        = 642 permille > 500 -> contaminated
    // doc 2: all novel -> 0 permille
    // doc 3: 12 tokens -> below the gram width, no verdict row
    val contaminated = (trainToks.take(30) ++ (1 to 10).map(i => s"nv$i"))
      .mkString(" ")
    val clean = (1 to 40).map(i => s"zz$i").mkString(" ")
    val short = (1 to 12).map(i => s"s$i").mkString(" ")

    val input = MemoryStream[(Long, String)]
    val got = mutable.Map[Long, (Long, Long, Long, Boolean)]()
    val batchIds = mutable.Map[Long, Long]()
    val q = StreamingDecontam.start(
      input.toDF().toDF("doc_id", "text"), trainGrams) { (verdicts, id) =>
      verdicts.collect().foreach { r =>
        val doc = r.getLong(0)
        assert(!got.contains(doc), s"doc $doc flagged twice")
        got(doc) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
        batchIds(doc) = id
      }
    }
    try {
      input.addData((1L, contaminated), (3L, short))
      q.processAllAvailable()
      assert(got.keySet == Set(1L), s"batch 1 verdicts: $got")
      input.addData((2L, clean))
      q.processAllAvailable()
      assert(got.keySet == Set(1L, 2L), s"batch 2 verdicts: $got")
    } finally q.stop()

    assert(got(1L) == ((28L, 18L, 1000L * 18 / 28, true)),
      s"hand-computed 642 permille must flag: ${got(1L)}")
    assert(got(2L) == ((28L, 0L, 0L, false)), s"clean doc: ${got(2L)}")
    assert(batchIds(1L) < batchIds(2L), "verdicts land in arrival order")
  }

  test("threshold boundary: permille == threshold does NOT flag") {
    import spark.implicits._
    // 26 tokens -> 14 grams; first 20 tokens shared -> grams i=1..8 hit
    // (i+12 <= 20): 8/14 = 571 > 500 flags; with threshold 571 it must not
    val trainToks = (1 to 20).map(i => s"w$i")
    val train = Seq((100L, trainToks.mkString(" "))).toDF("doc_id", "text")
    val probe = (trainToks ++ (1 to 6).map(i => s"nv$i")).mkString(" ")
    val batch = Seq((1L, probe)).toDF("doc_id", "text")
    val grams = StreamingDecontam.trainGramSet(train)

    val strict = StreamingDecontam.flagBatch(batch, grams).collect().head
    assert(strict.getLong(3) == 1000L * 8 / 14 && strict.getBoolean(4))
    val atBoundary = StreamingDecontam
      .flagBatch(batch, grams, thresholdPermille = 1000L * 8 / 14)
      .collect().head
    assert(!atBoundary.getBoolean(4),
      "flag is strictly-greater-than, matching q166's batch rule")
  }
}
