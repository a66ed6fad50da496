package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** q212 group-aware splitting: the no-straddle property the operator
  * exists for (a near-dup cluster lands wholly in ONE split), plus an
  * exact first-principles re-derivation of the whole report from the
  * collected label frame and the model h60.
  */
class GroupSplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  private def splitOf(bucket: Long): String =
    if (bucket < 900) "train" else if (bucket < 950) "val" else "test"

  test("q212 equals a first-principles grouped split; no cluster straddles splits") {
    val labels = Dedup.ccLabels(spark, sfDir)._1.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = graft.Tables.table(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val rows = ids.map { id =>
      val cluster = labels.getOrElse(id, id)
      val docSplit = splitOf(
        math.floorMod(ShingleModel.h60(s"split:$id"), 1000L))
      val groupSplit = splitOf(
        math.floorMod(ShingleModel.h60(s"gsplit:$cluster"), 1000L))
      (id, cluster, docSplit, groupSplit)
    }
    // no-straddle: group split is a pure function of the cluster
    val straddlers = rows.groupBy(_._2)
      .filter { case (_, members) => members.map(_._4).distinct.size > 1 }
    assert(straddlers.isEmpty, s"clusters straddling splits: ${straddlers.keys.take(3)}")
    // near-dup pairs can't leak across splits even when their per-doc
    // hashes disagree — the case q120 would flag after the fact
    val crossDocSplit = rows.groupBy(_._2).values
      .exists(ms => ms.map(_._3).distinct.size > 1)
    assert(crossDocSplit,
      "fixture sanity: some cluster's members have DIFFERING doc splits" +
        " (otherwise the migration metric is vacuous here)")
    val expected = rows.groupBy(_._4).map { case (gs, ms) =>
      gs -> (ms.map(_._2).distinct.length.toLong, ms.length.toLong,
        ms.count(m => m._3 != m._4).toLong)
    }
    val got = Dedup.q212(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.values.map(_._2).sum == ids.length)
  }
}
