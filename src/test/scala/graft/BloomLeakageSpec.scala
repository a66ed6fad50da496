package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{GraphRank, ReleaseOps}

/** q162 (bloom-prefiltered leakage) and q161 (BFS hops): the execution
  * claims their Scaladoc makes, pinned.
  */
class BloomLeakageSpec extends AnyFunSuite {

  lazy val spark = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"

  test("q162 equals q120 row for row (bloom prefilter is invisible)") {
    val exact = ReleaseOps.q120(spark, sfDir).collect().map(_.toSeq).toSeq
    val bloom = ReleaseOps.q162(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(bloom == exact)
  }

  test("q162's plan actually carries the bloom probe") {
    val plan = ReleaseOps.q162(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "expected a BloomFilterMightContain predicate in the executed plan")
  }

  test("q161 BFS distances verified against driver-side Dijkstra") {
    val rows = GraphRank.q161(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty && rows.values.min == 0L)
    // reference BFS from first principles on the collected edge list
    val edges = GraphRank.syndicationEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val seed = adj.keys.min
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (d <- 1L to GraphRank.MaxHops.toLong) {
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      dist ++= frontier.map(_ -> d)
    }
    assert(rows == dist)
  }
}
