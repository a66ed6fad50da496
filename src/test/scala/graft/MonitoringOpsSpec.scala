package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MonitoringOps

/** q202/q203/q205 invariants that hold by construction and must
  * survive any refactor: Benford rows are a complete digit domain
  * whose counts sum to the order count, the D-scaled CUSUM telescopes
  * to exactly zero at the final day (the "exact mean removal" claim),
  * and q205's MI·N respects the N·min(H(x), H(y)) entropy bound up to
  * micronat quantization noise.
  */
class MonitoringOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("q202: all nine digits present, counts sum to the order count, zero digit impossible") {
    val rows = MonitoringOps.q202(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val orderCount = graft.Tables.table(spark, sfDir, "orders").count()
    assert(rows.map(_.getLong(1)).sum == orderCount)
    // dev = obs − exp row-wise, and expected permilles are the pinned table
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
    assert(rows.map(_.getLong(3)).sum == 995L) // floor(1000·log10(1+1/d)) sums to 995
  }

  test("q205: MI·N is bounded by N·min(H(x), H(y)) and near-zero quantization noise is tolerated") {
    import org.apache.spark.sql.functions._
    val row = MonitoringOps.q205(spark, sfDir).collect().head
    val (n, miSum) = (row.getLong(0), row.getLong(2))
    // recompute the marginals' entropy bound independently
    val ev = graft.Tables.table(spark, sfDir, "events")
      .select(col("event_type").as("x"),
        expr("unix_micros(ts) DIV 86400000000 % 7").as("y")).collect()
    def entropyN(counts: Seq[Long]): Double = {
      val total = counts.sum.toDouble
      counts.map(c => -c * math.log(c / total)).sum // in nats·N
    }
    val hx = entropyN(ev.groupBy(_.getString(0)).map(_._2.length.toLong).toSeq)
    val hy = entropyN(ev.groupBy(_.getLong(1)).map(_._2.length.toLong).toSeq)
    val bound = math.min(hx, hy) * 1000000d
    assert(n == ev.length.toLong)
    assert(miSum <= bound + n, s"MI·N $miSum exceeds the entropy bound $bound")
    assert(miSum >= -n, s"MI·N $miSum below quantization floor") // ≥ −1 micronat/event
  }

  test("q203: the D-scaled CUSUM telescopes to 0 on the last day (exact mean removal)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // recompute the full series independently and check S_D == 0;
    // q203 itself returns only the top-5 |S| days
    val daily = graft.Tables.table(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).sortBy(_._1)
    val d = daily.length.toLong
    val t = daily.map(_._2).sum
    val cusums = daily.scanLeft(0L) { case (s, (_, c)) => s + c * d - t }.drop(1)
    assert(cusums.last == 0L)
    // and the query's top row is the true argmax of |S_t|
    val top = MonitoringOps.q203(spark, sfDir).collect()
    assert(top.nonEmpty)
    assert(math.abs(top.head.getLong(2)) == cusums.map(math.abs).max)
  }
}
