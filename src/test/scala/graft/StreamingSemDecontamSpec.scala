package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EvalOps
import graft.streaming.StreamingSemDecontam

/** Streaming semantic decontamination: per-batch verdicts against the
  * static held-out panel must equal q228's batch rule — same
  * quantization, same exact int64 min-d², same threshold — with each
  * vector flagged exactly once, panel members and ragged vectors
  * excluded, and the min-d² values matching an independent Scala model.
  */
class StreamingSemDecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Unit-ish 64-dim vector with a 1.0 at `hot` and `eps` elsewhere. */
  private def vec(hot: Int, eps: Float = 0.0f): Array[Float] =
    Array.tabulate(64)(i => if (i == hot) 1.0f else eps)

  private def q(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 10000).toLong)

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("per-batch verdicts match the q228 rule exactly once, with panel and " +
    "ragged exclusion, and min-d2 matches the quantized model") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // panel ids satisfy vec_id % 17 == 0 && vec_id < 1700
    val panelRows = Seq(
      (0L, 1L, vec(0)), (17L, 2L, vec(1)))
    // near-dup of panel vector 0 (tiny perturbation -> leaked),
    // a far vector (hot dim no panel member uses -> clean),
    // a ragged 32-dim vector (excluded), and a panel id arriving in
    // the stream (excluded - it IS the benchmark)
    val near = (5L, 1L, vec(0, 0.01f))
    val far = (6L, 3L, vec(40))
    val ragged = (7L, 1L, Array.fill(32)(0.5f))
    val panelEcho = (34L, 2L, vec(1))

    val static = panelRows.toDF("vec_id", "label", "embedding")
    val panel = StreamingSemDecontam.panelOf(static).cache()
    assert(panel.count() == 2)

    // independent model of the two verdicts
    val panelQ = panelRows.map(p => q(p._3))
    val expNear = panelQ.map(p => d2(q(near._3), p)).min
    val expFar = panelQ.map(p => d2(q(far._3), p)).min
    assert(expNear <= EvalOps.SemLeakD2Max)
    assert(expFar > EvalOps.SemLeakD2Max)

    val input = MemoryStream[(Long, Long, Array[Float])]
    val got = mutable.Map[Long, (Long, Long, Boolean)]()
    val stream = StreamingSemDecontam.start(
      input.toDF().toDF("vec_id", "label", "embedding"), panel) {
      (verdicts, _) =>
        verdicts.collect().foreach { r =>
          val id = r.getLong(0)
          assert(!got.contains(id), s"vec $id flagged twice")
          got(id) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
        }
    }
    try {
      input.addData(near, ragged)
      stream.processAllAvailable()
      assert(got.keySet == Set(5L), s"batch 1 verdicts: $got")
      input.addData(far, panelEcho)
      stream.processAllAvailable()
      assert(got.keySet == Set(5L, 6L), s"batch 2 verdicts: $got")
    } finally stream.stop()

    assert(got(5L) == ((1L, expNear, true)))
    assert(got(6L) == ((3L, expFar, false)))

    // batch/stream parity: flagBatch on the union frame == the two
    // streamed verdicts (the shared-constructor guarantee)
    val union = Seq(near, far, ragged, panelEcho)
      .toDF("vec_id", "label", "embedding")
    val batch = StreamingSemDecontam.flagBatch(union, panel).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(batch == got.toMap)
  }
}
