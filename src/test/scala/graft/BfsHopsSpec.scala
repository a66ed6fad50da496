package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphRank

/** q161 BFS hop distance: the DuckDB oracle walks the same graph with a
  * recursive CTE; this spec re-derives the distances with a plain
  * driver-side queue BFS over the collected edge list, so a bug hitting
  * both engines' join-based relaxation identically would still be
  * caught. Also pins the Bellman-Ford bound: MaxHops rounds of
  * relaxation must equal true BFS for every node within MaxHops.
  */
class BfsHopsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  test("q161 matches a first-principles queue BFS from the same seed") {
    val directed = GraphRank.syndicationEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(directed.nonEmpty, "sf0.01 corpus must contain syndication edges")
    val undirected = directed.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .distinct
    val adj = undirected.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seed = undirected.map(_._1).min

    val dist = mutable.Map(seed -> 0L)
    val queue = mutable.Queue(seed)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      val d = dist(u)
      if (d < GraphRank.MaxHops)
        for (v <- adj.getOrElse(u, Array.empty[String]) if !dist.contains(v)) {
          dist(v) = d + 1; queue += v
        }
    }

    val (gotDf, rounds) = GraphRank.bfsHopsWithRounds(spark, sfDir)
    val got = gotDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == dist.toMap,
      s"join-relaxation distances must equal queue BFS; " +
        s"only-in-spark=${got.keySet -- dist.keySet} " +
        s"only-in-bfs=${dist.keySet -- got.keySet} " +
        s"diff=${got.collect { case (k, v) if dist.get(k).exists(_ != v) => (k, v, dist(k)) }}")
    // the seed really is the lexicographic minimum and sits at distance 0
    assert(got(seed) == 0L)
    // early exit: the loop stops one confirming round past the seed's
    // capped eccentricity instead of always burning MaxHops rounds
    val ecc = dist.values.max
    assert(rounds == math.min(ecc + 1, GraphRank.MaxHops.toLong),
      s"expected fixpoint exit after ecc+1=${ecc + 1} rounds, ran $rounds")
  }
}
