package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpaceSaving

/** Space-Saving guarantees under arbitrary partitioning: estimates
  * bracket the true count (true <= est <= true + err... est - err <=
  * true <= est) and every sufficiently-heavy item survives the merge.
  */
class SpaceSavingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val K = 16

  /** 3 heavy items over a long unit tail; n = 3800, n/K = 237.5. */
  private def data(): Seq[String] =
    Seq.fill(1000)("h1") ++ Seq.fill(500)("h2") ++ Seq.fill(300)("h3") ++
      (0 until 2000).map(i => s"tail$i")

  private val truth = Map("h1" -> 1000L, "h2" -> 500L, "h3" -> 300L)
      .withDefaultValue(1L)

  private def runWith(parts: Int): Seq[SpaceSaving.Hit] = {
    import spark.implicits._
    val ss = udaf(new SpaceSaving(K))
    data().toDF("item").repartition(parts)
      .agg(ss(col("item")).as("hits"))
      .select(explode(col("hits")).as("h"))
      .select(col("h.item"), col("h.count"), col("h.err"))
      .collect().map(r => SpaceSaving.Hit(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  for (parts <- Seq(1, 8)) {
    test(s"bounds and heavy-item recovery hold at $parts partition(s)") {
      val hits = runWith(parts)
      assert(hits.size <= K)
      hits.foreach { h =>
        assert(h.count >= truth(h.item), s"underestimate: $h")
        assert(h.count - h.err <= truth(h.item), s"bad lower bound: $h")
      }
      // every item with true count > n/K must be present
      val present = hits.map(_.item).toSet
      assert(Set("h1", "h2", "h3").subsetOf(present), s"lost a heavy hitter: $present")
      // and the heaviest item ranks first
      assert(hits.head.item == "h1", s"h1 not first: ${hits.take(3)}")
    }
  }

  test("no evictions => exact counts and zero error") {
    import spark.implicits._
    val ss = udaf(new SpaceSaving(64))
    val hits = Seq("a", "a", "b", "a", "c").toDF("item").repartition(3)
      .agg(ss(col("item")).as("hits"))
      .select(explode(col("hits")).as("h"))
      .select(col("h.item"), col("h.count"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(hits.toSet == Set(("a", 3L, 0L), ("b", 1L, 0L), ("c", 1L, 0L)))
  }
}
