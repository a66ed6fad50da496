package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** Hot-bucket cap in the LSH candidate join (q21/q78): a viral
  * boilerplate string must not make one (band, bucket) quadratic, and
  * the default cap must provably never fire on the gated corpus (so the
  * uncapped DuckDB oracle still hash-matches).
  */
class DedupHotBucketSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.1"

  test("default cap never fires on the gated corpus (sf0.1)") {
    val maxBucket = Dedup.bandedSigs(spark, sfDir)
      .groupBy(col("band_idx"), col("bh")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxBucket < 64,
      s"largest sf0.1 LSH bucket is $maxBucket docs — approaching the " +
        s"${Dedup.MaxBucketDocs} cap; capped output would diverge from the " +
        "uncapped oracle")
  }

  test("capped candidates are identical to uncapped on the gated corpus") {
    val capped = Dedup.candidatePairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.candidatePairs(spark, sfDir, Int.MaxValue)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
  }

  test("a viral boilerplate bucket is capped to cap*(cap-1)/2 pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hotbucket-")
    try {
      val boiler = "subscribe to our newsletter for the latest updates and offers"
      val docs = (1L to 200L).map(i => (i, boiler)) ++
        Seq((901L, "a genuinely unique document about alpine meteorology"),
          (902L, "another unique text concerning tidal harmonics and buoys"))
      docs.toDF("doc_id", "text").repartition(4)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val cap = 8
      val pairs = Dedup.candidatePairs(spark, dir.toString, cap)
        .select(col("doc_a"), col("doc_b")).collect()
      // identical docs share every band, so the capped bucket keeps the
      // cap lowest doc_ids -> C(cap, 2) distinct pairs, deterministic
      assert(pairs.length == cap * (cap - 1) / 2,
        s"expected ${cap * (cap - 1) / 2} capped pairs, got ${pairs.length}")
      val ids = pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      assert(ids == (1L to cap.toLong).toSet,
        s"cap must keep the lowest doc_ids deterministically, got $ids")

      // sanity: uncapped really is quadratic on this corpus
      val uncapped = Dedup.candidatePairs(spark, dir.toString, Int.MaxValue).count()
      assert(uncapped == 200L * 199 / 2)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively()
    }
  }

  test("q23's quadratic-baseline guard: inert at the gated SFs, loud past " +
    "the declared ceiling") {
    // the gated corpora sit far under the ceiling (sample = doc_id % 25)
    Dedup.q23Guard(20L)
    Dedup.q23Guard(Dedup.Q23MaxSampledDocs)
    // past it, the guard must name the scalable alternatives
    val ex = intercept[IllegalArgumentException] {
      Dedup.q23Guard(Dedup.Q23MaxSampledDocs + 1)
    }
    assert(ex.getMessage.contains("q21") && ex.getMessage.contains("q42"))
    // and the real query path still runs under the guard at sf0.1
    assert(Dedup.q23(spark, sfDir).count() >= 0)
  }

  test("q87's removal joins by measured drop size: broadcast small, shuffle big") {
    import spark.implicits._
    val corpus = (0L until 1000L).map(i => (i, s"lang${i % 3}"))
      .toDF("doc_id", "lang")
    val drop = (0L until 1000L by 2).toDF("doc_id")
    // real-corpus regime: the drop set fits the cap -> broadcast hint
    val small = Dedup.removeDropped(corpus, drop, dropCount = 500L)
    assert(small.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "in-cap drop set must broadcast (corpus side never shuffles)")
    // pathological regime: over the cap -> hinted shuffle join, and the
    // hint must survive planning so nothing re-broadcasts the big set
    val big = Dedup.removeDropped(corpus, drop, dropCount = 500L,
      maxBroadcast = 10L)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(!bigPlan.contains("BroadcastHashJoin"),
      s"over-cap drop set must not broadcast:\n$bigPlan")
    // both strategies keep exactly the odd ids
    val expected = (1L until 1000L by 2).toSeq
    for (df <- Seq(small, big))
      assert(df.select(col("doc_id")).collect().map(_.getLong(0)).sorted
        .toSeq == expected)
  }
}
