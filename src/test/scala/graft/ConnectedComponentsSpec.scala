package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** Large-star/small-star connected components: exact agreement with a
  * driver-side union-find on seeded random graphs, plus the O(log n)
  * round-count claim on the worst case for label propagation (a long
  * path).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  /** Reference answer: plain union-find over the same edges. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def ccLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val expected = unionFind(n, edges)
      val got = ccLabels(edges)
      // CC only labels nodes incident to an edge
      val touched = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      assert(got.keySet == touched, s"trial $trial node set")
      touched.foreach { id =>
        assert(got(id) == expected(id), s"trial $trial node $id")
      }
    }
  }

  test("path graph of 256 nodes converges in O(log n) rounds") {
    import spark.implicits._
    val edges = (0L until 255L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = ConnectedComponents.runWithStats(edges)
    // label propagation would need ~255 rounds here; star contraction
    // halves the height per alternation
    assert(rounds <= 12, s"took $rounds rounds")
    assert(labels.collect().forall(_.getLong(1) == 0L))
  }

  test("handles duplicate edges, self-loops, and mixed orientation") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 5L), (3L, 5L), (9L, 9L),
      (7L, 8L), (8L, 7L))
    val got = ccLabels(edges)
    assert(got == Map(3L -> 3L, 5L -> 3L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("edgeless input yields empty labels") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.run(empty).isEmpty)
  }

  test("runWithDropCount's free count equals the labelled non-representatives") {
    import spark.implicits._
    val rnd = new Random(7)
    // random graph + a long chain + singleton self-loops: mixed topology
    val edges = (Seq.fill(150)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)) ++
      (100L until 140L).map(i => (i, i + 1)) ++ Seq((200L, 200L), (201L, 201L)))
      .toDF("src", "dst")
    val (labels, dropped) = ConnectedComponents.runWithDropCount(edges)
    val fromLabels = labels.filter(col("id") =!= col("label")).count()
    assert(dropped == fromLabels,
      s"checksum-derived count $dropped != labelled count $fromLabels")
    // self-loop singletons are their own representative: never counted
    val singles = labels.filter(col("id").isin(200L, 201L)).collect()
    assert(singles.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
