package graft

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingKnScore, StreamingNearDup}

/** Sustained-soak specs for the two heaviest streaming twins. The
  * per-operator specs pin SEMANTICS at micro-batch scale; these pin the
  * property that only shows up over a long run — state-store size stays
  * BOUNDED under a workload that would grow it monotonically if the
  * event-time TTL (or the declared statelessness) were broken. 100+
  * micro-batches is far past the point where an unbounded keyspace
  * separates from a TTL-bounded one (state here turns over every ~35
  * batches).
  */
class StreamingSoakSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  test("StreamingNearDup soak: 120 batches of fresh buckets; state rows " +
    "plateau at the TTL horizon instead of growing with the batch count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingNearDup.dedup(
      StreamingNearDup.signatures(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "10 minutes")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_soak").start()

    // every doc is novel (unique token universe per doc) -> every doc
    // opens or touches a bucket; 2 min per batch means the 1 h TTL +
    // 10 min watermark horizon covers ~35 batches of live state
    val batches = 120
    val docsPerBatch = 5
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val stateRows = mutable.ArrayBuffer.empty[Long]
    var fed = 0L
    for (b <- 0 until batches) {
      val batchTs = t0 + b.toLong * 120000L
      input.addData((0 until docsPerBatch).map { i =>
        val id = b.toLong * docsPerBatch + i
        (id, (1 to 40).map(w => s"b${b}d${i}w$w").mkString(" "), ts(batchTs))
      }: _*)
      q.processAllAvailable()
      fed += docsPerBatch
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows += p.stateOperators(0).numRowsTotal
    }
    q.processAllAvailable()
    val verdicts = spark.table("neardup_soak").count()
    q.stop()

    assert(verdicts == fed, s"every doc needs exactly one verdict: $verdicts/$fed")
    // TTL horizon = (60 min TTL + 10 min watermark) / 2 min per batch
    // = 35 batches x 5 one-doc buckets, plus generous slack for the
    // watermark trailing a batch or two
    val bound = 40L * docsPerBatch
    assert(stateRows.nonEmpty && stateRows.max <= bound,
      s"state store must plateau under $bound rows, saw max ${stateRows.max}")
    // growth check: the second half of the soak must not trend upward
    // (an unbounded keyspace would add 5 rows per batch forever)
    val half = stateRows.size / 2
    val firstHalfMax = stateRows.take(half).max
    assert(stateRows.drop(half).max <= firstHalfMax + docsPerBatch,
      s"state grew across the soak: first-half max $firstHalfMax, " +
        s"second-half max ${stateRows.drop(half).max}")
  }

  test("StreamingKnScore soak: 100 batches against the static model; " +
    "zero state operators by design, every doc scored exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val model = StreamingKnScore.modelOf(spark, "/root/testdata/sf0.001")
    val input = MemoryStream[(Long, String, String)]
    val scored = mutable.ArrayBuffer.empty[(Long, Long)] // (batch, rows)
    val ids = mutable.LinkedHashSet.empty[Long]
    val q = StreamingKnScore.start(
      input.toDF().toDF("doc_id", "lang", "text"), model) { (df, id) =>
      val rows = df.select(col("doc_id")).collect().map(_.getLong(0))
      synchronized { scored += ((id, rows.length.toLong)); ids ++= rows }
    }
    val batches = 100
    val docsPerBatch = 3
    for (b <- 0 until batches) {
      input.addData((0 until docsPerBatch).map { i =>
        val id = b.toLong * docsPerBatch + i
        (id, "en", s"the quick brown fox jumps over the lazy dog $b $i")
      }: _*)
      q.processAllAvailable()
    }
    val lastState = Option(q.lastProgress).map(_.stateOperators.length)
    q.stop()

    // stateless by design: the model is a STATIC broadcast artifact and
    // foreachBatch carries nothing across batches — a state operator
    // appearing here means someone made the scorer stateful by accident
    assert(lastState.contains(0),
      s"KN scorer must run with zero state operators, saw $lastState")
    assert(ids.size == batches.toLong * docsPerBatch,
      s"every doc scored exactly once: ${ids.size}")
    // per-batch output is flat (no cross-batch accumulation in the sink
    // frames): every non-empty scored batch carries exactly its own docs
    assert(scored.filter(_._2 > 0).forall(_._2 == docsPerBatch.toLong),
      s"per-batch verdict counts must stay flat: ${scored.filter(_._2 > 0).take(8)}")
  }

  test("stream-stream interval join soak: 120 batches; BOTH sides' state " +
    "plateaus at the interval+watermark horizon; output equals the batch twin") {
    // The r13 verdict's optional item: the stream-stream join under the
    // soak protocol. Clicks attribute to purchases ≤30 min later for
    // the same user; 10-min watermarks both sides. At 2 min of event
    // time per batch, live state per side is bounded by the
    // (30 min interval + 10 min watermark) / 2 min ≈ 20-batch horizon —
    // an unbounded-state join would hold every row forever.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val c = clicks.toDF().toDF("user_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user_id", "purchase_ts")
      .withWatermark("purchase_ts", "10 minutes")
    val cond = col("user_id") === col("p_user_id") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES")
    val q = c.join(p, cond).writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_soak").start()

    val batches = 120
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val stateRows = mutable.ArrayBuffer.empty[Long]
    val allClicks = mutable.ArrayBuffer.empty[(Long, Timestamp)]
    val allPurchases = mutable.ArrayBuffer.empty[(Long, Timestamp)]
    for (b <- 0 until batches) {
      val batchTs = t0 + b.toLong * 120000L
      // fresh user ids every batch → every row opens new join state;
      // purchase lands 20 min after the click (inside the interval) so
      // ~half the batches also produce a cross-batch match
      val u = 1000L * b
      val cRows = Seq((u, ts(batchTs)), (u + 1, ts(batchTs + 30000L)))
      val pRows = Seq((u, ts(batchTs + 1200000L)), // +20 min: match
        (u + 1, ts(batchTs + 3000000L))) // +50 min: outside interval
      clicks.addData(cRows: _*)
      purchases.addData(pRows: _*)
      q.processAllAvailable()
      allClicks ++= cRows
      allPurchases ++= pRows
      val prog = q.lastProgress
      if (prog != null && prog.stateOperators.nonEmpty)
        stateRows += prog.stateOperators.map(_.numRowsTotal).sum
    }
    q.processAllAvailable()
    val streamed = spark.table("ssjoin_soak")
      .select(col("user_id"), col("purchase_ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).sorted.toSeq
    q.stop()

    // batch twin on the identical rows — the join semantics cannot fork
    // between the streaming and batch planners. The batch side sees ALL
    // rows; the streamed side may still hold post-watermark matches
    // back, so require streamed ⊆ batch AND streamed covers every match
    // older than the final watermark horizon (all but the last ~25
    // batches of event time).
    val batchTwin = allClicks.toSeq.toDF("user_id", "click_ts")
      .join(allPurchases.toSeq.toDF("p_user_id", "purchase_ts"), cond)
      .select(col("user_id"), col("purchase_ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).sorted.toSeq
    assert(streamed.toSet.subsetOf(batchTwin.toSet),
      "streamed matches must be a subset of the batch twin")
    val horizon = t0 + (batches - 25).toLong * 120000L
    val overdue = batchTwin.filter(_._2.getTime < horizon)
    assert(overdue.toSet.subsetOf(streamed.toSet),
      s"matches older than the watermark horizon must all be emitted: " +
        s"${overdue.size} expected, ${overdue.count(streamed.toSet)} present")
    assert(streamed.nonEmpty && streamed.size >= batches - 25,
      s"soak must actually produce matches: ${streamed.size}")

    // plateau: second half of the soak must not trend upward
    val half = stateRows.size / 2
    assert(stateRows.nonEmpty, "state metrics must be reported")
    val firstHalfMax = stateRows.take(half).max
    assert(stateRows.drop(half).max <= firstHalfMax + 8,
      s"join state grew across the soak: first-half max $firstHalfMax, " +
        s"second-half max ${stateRows.drop(half).max}")
  }
}
