package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingNearDup

/** Streaming MinHash near-dup detection: near-dups are flagged against
  * docs seen in EARLIER micro-batches (state works), distinct docs
  * pass, and bucket state EXPIRES once the watermark passes its last
  * activity + TTL (bounded state).
  */
class StreamingNearDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val docA = (1 to 40).map(i => s"alpha$i").mkString(" ")
  private val docANear = (1 to 39).map(i => s"alpha$i").mkString(" ") + " changed"
  private val docANear2 = (1 to 39).map(i => s"alpha$i").mkString(" ") + " changedagain"
  private val docB = (1 to 40).map(i => s"beta$i").mkString(" ")
  private val docC = (1 to 40).map(i => s"gamma$i").mkString(" ")

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("near-dup lands in the same bucket with high agreement (precondition)") {
    import spark.implicits._
    val sigs = StreamingNearDup.signatures(
      Seq((1L, docA, ts("2024-01-01 10:00:00")),
        (3L, docANear, ts("2024-01-01 10:01:00")),
        (2L, docB, ts("2024-01-01 10:02:00")))
        .toDF("doc_id", "text", "ts"))
      .collect().map(s => s.doc_id -> s).toMap
    assert(sigs(1L).bucket == sigs(3L).bucket,
      "craft docANear so its first-band minhashes match docA")
    val agree = sigs(1L).sig.zip(sigs(3L).sig).count { case (x, y) => x == y }
    assert(agree >= StreamingNearDup.AgreeThreshold, s"agreement only $agree/16")
    assert(sigs(1L).bucket != sigs(2L).bucket)
  }

  test("flags near-dups across micro-batches; state expires after the TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingNearDup.dedup(
      StreamingNearDup.signatures(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "10 minutes")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()

    input.addData((1L, docA, ts("2024-01-01 10:00:00")),
      (2L, docB, ts("2024-01-01 10:00:30")))
    q.processAllAvailable()
    input.addData((3L, docANear, ts("2024-01-01 10:05:00")),
      (4L, docC, ts("2024-01-01 10:06:00")),
      (5L, docB, ts("2024-01-01 10:07:00")))
    q.processAllAvailable()
    // push the watermark far past bucket A's last activity + 1h TTL,
    // then replay a near-dup of A: its state has expired -> kept
    input.addData((6L, docC, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    input.addData((7L, docANear2, ts("2024-01-01 14:01:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("neardup_out")
      .select(col("doc_id"), col("kept"), col("dup_of"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(rows(1L) == ((true, -1L)))
    assert(rows(2L) == ((true, -1L)))
    assert(rows(3L) == ((false, 1L)), s"doc 3 should dup doc 1: ${rows(3L)}")
    assert(rows(4L) == ((true, -1L)))
    assert(rows(5L) == ((false, 2L)), s"exact dup of doc 2: ${rows(5L)}")
    assert(rows(7L) == ((true, -1L)),
      s"doc 7 arrives after bucket expiry and must be kept: ${rows(7L)}")
  }

  // ------------------------------------------------------- multi-band

  /** Seeded near-dup corpus: 10 bases of 40 unique words; 12 variants
    * mutate 1–6 words at scattered positions. Which band catches which
    * pair depends on where the mutated shingles land in the minhash —
    * exactly the recall gap multi-band exists to close.
    */
  private def seededCorpus: (Seq[(Long, String, Timestamp)], Seq[(Long, String, Timestamp)], Map[Long, Long]) = {
    def tokens(d: Int) = (1 to 40).map(i => s"w${d}_$i").toVector
    def doc(toks: Vector[String]) = toks.mkString(" ")
    val bases = (1 to 10).map(d => (d.toLong, doc(tokens(d)), ts("2024-01-01 10:00:00")))
    val muts: Seq[(Int, Seq[Int])] = Seq(
      (1, Seq(0)), (1, Seq(20)), (2, Seq(5, 35)), (2, Seq(0, 1)),
      (3, Seq(10, 11, 12)), (3, Seq(2, 18, 33)), (4, Seq(0, 13, 26, 39)),
      (4, Seq(7, 8, 21, 22)), (5, Seq(3, 9, 15, 27, 31)),
      (5, Seq(0, 1, 2, 3, 4)), (6, Seq(6, 12, 19, 25, 32, 38)),
      (6, Seq(30, 31, 32, 33, 34, 35)))
    val variants = muts.zipWithIndex.map { case ((base, pos), i) =>
      val t = pos.foldLeft(tokens(base))((acc, p) => acc.updated(p, s"mut${i}_$p"))
      ((101 + i).toLong, doc(t), ts("2024-01-01 10:05:00"))
    }
    val truth = muts.zipWithIndex.map { case ((base, _), i) => (101 + i).toLong -> base.toLong }.toMap
    (bases, variants, truth)
  }

  /** Batch 4-band LSH candidate recall on the same corpus: same-bucket
    * pairs with >= AgreeThreshold agreeing hashes — the upper bound the
    * streaming OR must reach.
    */
  private def batchDetected(all: Seq[(Long, String, Timestamp)], truth: Map[Long, Long]): Set[Long] = {
    import spark.implicits._
    val sigs = StreamingNearDup.signaturesBanded(all.toDF("doc_id", "text", "ts")).toDF()
    val agree = expr("size(filter(zip_with(a_sig, b_sig, (x, y) -> x = y), v -> v))")
    val pairs = sigs.select(col("doc_id").as("a_id"), col("bucket"), col("sig").as("a_sig"))
      .join(sigs.select(col("doc_id").as("b_id"), col("bucket"), col("sig").as("b_sig")), "bucket")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), agree.as("agree"))
      .filter(col("agree") >= StreamingNearDup.AgreeThreshold)
      .select(col("a_id"), col("b_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    truth.keySet.filter { v =>
      pairs.exists { case (a, b) =>
        (b == v && (a == truth(v) || truth.get(a).contains(truth(v)))) ||
          (a == v && (b == truth(v) || truth.get(b).contains(truth(v))))
      }
    }
  }

  test("multi-band OR recall >= batch LSH candidate recall > single-band recall") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (bases, variants, truth) = seededCorpus
    val batchHit = batchDetected(bases ++ variants, truth)
    assert(batchHit.nonEmpty, "seed corpus produced no batch candidates — retune")

    def runStream(banded: Boolean): Map[Long, (Boolean, Long)] = {
      val input = MemoryStream[(Long, String, Timestamp)]
      val src = input.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "10 minutes")
      val out = if (banded)
        StreamingNearDup.combineBanded(
          StreamingNearDup.dedupBanded(StreamingNearDup.signaturesBanded(src)))
      else
        StreamingNearDup.dedup(StreamingNearDup.signatures(src)).toDF()
      val name = if (banded) "nd_banded" else "nd_single"
      // the banded chain needs the stateful-chain check scoped OFF just
      // for this query's start; the helper restores the session conf
      def drive(): Unit = {
        val q = out.writeStream.outputMode("append")
          .format("memory").queryName(name).start()
        input.addData(bases: _*)
        q.processAllAvailable()
        input.addData(variants: _*)
        q.processAllAvailable()
        // sentinel far past every window + watermark delay: flushes the
        // combine aggregation's open windows
        input.addData((9999L, "flush sentinel doc", ts("2024-01-01 13:00:00")))
        q.processAllAvailable()
        q.stop()
      }
      if (banded) StreamingNearDup.withStatefulChainUnchecked(spark)(drive())
      else drive()
      spark.table(name).select(col("doc_id"), col("kept"), col("dup_of"))
        .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    }

    val multi = runStream(banded = true)
    // the scoped override must not leak: the session keeps its default
    // fail-fast guard for unrelated streaming queries
    assert(spark.conf.getOption(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
      .forall(_ == "true"),
      "withStatefulChainUnchecked leaked the conf override")
    val single = runStream(banded = false)
    def detected(rows: Map[Long, (Boolean, Long)]): Set[Long] =
      truth.keySet.filter(v => rows.get(v).exists { case (kept, of) =>
        !kept && (of == truth(v) || truth.get(of).contains(truth(v)))
      })
    val multiHit = detected(multi)
    val singleHit = detected(single)
    info(s"recall: multi=${multiHit.size}/${truth.size} " +
      s"batch=${batchHit.size}/${truth.size} single=${singleHit.size}/${truth.size}")
    // every base must be kept in both modes
    bases.foreach { case (id, _, _) =>
      assert(multi(id) == ((true, -1L)), s"base $id dropped in multi-band")
      assert(single(id) == ((true, -1L)), s"base $id dropped in single-band")
    }
    assert(multiHit.size >= batchHit.size,
      s"multi-band recall ${multiHit.size} below batch candidate recall ${batchHit.size}")
    assert(multiHit.size > singleHit.size,
      s"multi-band (${multiHit.size}) must beat single-band (${singleHit.size}) on this corpus")
  }

  test("short docs get verdicts too: exact dups flagged, others kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingNearDup.dedup(
      StreamingNearDup.signatures(
        input.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "10 minutes")))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_short").start()
    input.addData((1L, "hello world", ts("2024-01-01 10:00:00")),
      (2L, "bye", ts("2024-01-01 10:00:10")))
    q.processAllAvailable()
    input.addData((3L, "hello world", ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("neardup_short")
      .select(col("doc_id"), col("kept"), col("dup_of"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), s"every doc needs a verdict: $rows")
    assert(rows(1L) == ((true, -1L)) && rows(2L) == ((true, -1L)))
    assert(rows(3L) == ((false, 1L)), s"exact short dup: ${rows(3L)}")
  }
}
