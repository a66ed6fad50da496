package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational9

/** q131 (the TPC-H Q21 archetype): the DuckDB oracle gates the literal
  * EXISTS/NOT EXISTS spelling; this spec pins (a) that Spark planned
  * the quantifiers as semi/anti JOINS — not re-executed correlated
  * subqueries — and (b) a full first-principles recompute in Scala.
  */
class WaitingSuppliersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  test("the quantifiers plan as one semi and one anti join") {
    val plan = Relational9.q131(spark, sfDir)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as semi join:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS must plan as anti join:\n$plan")
  }

  test("q131 equals a first-principles quantifier evaluation") {
    import spark.implicits._
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val orderDates = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    val names = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap

    val lateMs = Relational9.LateDays.toLong * 24 * 3600 * 1000
    val late = lines.collect {
      case (ok, sk, ship) if orderDates.contains(ok) &&
        ship.getTime > orderDates(ok).getTime + lateMs => (ok, sk)
    }.distinct
    val suppsOnOrder = lines.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSet).toMap
    val lateOnOrder = late.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val blamed = late.filter { case (ok, sk) =>
      (suppsOnOrder(ok) - sk).nonEmpty && (lateOnOrder(ok) - sk).isEmpty
    }
    val expected = blamed.groupBy(p => names(p._2)).view
      .mapValues(_.length.toLong).toSeq
      .sortBy { case (n, c) => (-c, n) }
      .take(Relational9.WaitingTop)

    val got = Relational9.q131(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"engine ${got.take(3)} vs model ${expected.take(3)}")
    assert(got.nonEmpty && got.head._2 > 0)
  }
}
