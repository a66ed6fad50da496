package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational12

/** q144-q146: first-principles Scala recomputation of the ship-delay
  * distribution, RFM segmentation, and FK audit at sf0.01 — plus an
  * orphan-injection fixture proving q146 actually detects and counts
  * violations (the clean corpus alone would pass a check that never
  * looks).
  */
class ArchetypePack3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  import ExactModel.lowerMedian

  // ---------------------------------------------------------------- q144

  test("q144 equals a first-principles ship-delay evaluation") {
    import spark.implicits._
    val firstShip = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE)")
      .as[(Long, java.sql.Date)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2.toLocalDate).min(
        Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))).toMap
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_orderpriority", "CAST(o_orderdate AS DATE)")
      .as[(Long, String, java.sql.Date)].collect()
    val delays = orders.flatMap { case (k, pri, od) =>
      firstShip.get(k).map(fs =>
        pri -> java.time.temporal.ChronoUnit.DAYS.between(od.toLocalDate, fs))
    }
    val expected = delays.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (pri, ds) =>
        val xs = ds.map(_._2)
        (pri, xs.length.toLong, lowerMedian(xs), xs.max)
    }

    val got = Relational12.q144(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(expected.size == 5, "all five priority classes must appear")
  }

  // ---------------------------------------------------------------- q145

  test("q145 equals a first-principles RFM bucketing") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE)", "o_totalprice")
      .as[(Long, java.sql.Date, Double)].collect()
    val perCust = orders.groupBy(_._1).view.mapValues { g =>
      val last = g.map(_._2.toLocalDate).max(
        Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      val cents = g.map(o => math.floor(o._3 * 100.0 + 0.5).toLong).sum
      (last, g.length.toLong, cents)
    }.toMap
    val refD = perCust.values.map(_._1).max(
      Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    def bits(x: Long): Long = java.lang.Long.toBinaryString(x).length.toLong
    val expected = perCust.values.toSeq.map { case (last, n, cents) =>
      (bits(java.time.temporal.ChronoUnit.DAYS.between(last, refD)),
        bits(n), bits(cents / 10000))
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy(_._1).map { case ((r, f, m), n) => (r, f, m, n) }

    val got = Relational12.q145(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(expected.size > 3, "fixture must spread customers over segments")
  }

  // ---------------------------------------------------------------- q146

  test("q146 reports all seven edges clean on the driver corpus") {
    val got = Relational12.q146(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val edges = got.map(_._1)
    assert(edges == Seq("customer->nation", "lineitem->orders",
      "lineitem->part", "lineitem->supplier", "nation->region",
      "orders->customer", "supplier->nation"))
    assert(got.forall(e => e._3 == 0L && e._4 == 0L),
      s"driver corpus must be referentially clean, got $got")
    assert(got.forall(_._2 > 0L), "every child table must have rows")
  }

  test("q146 counts injected orphans exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fk_audit").toString
    try {
      // 6 lineitems: 2 orphan orderkeys, 1 orphan partkey, 1 null suppkey
      Seq[(Long, Long, java.lang.Long)](
        (1L, 10L, 100L), (1L, 11L, 100L), (2L, 10L, 101L),
        (7L, 10L, 100L), (8L, 99L, 100L), (2L, 11L, null))
        .toDF("l_orderkey", "l_partkey", "l_suppkey")
        .write.parquet(s"$dir/lineitem.parquet")
      // orders 1,2,3; order 3 -> orphan customer
      Seq((1L, 20L), (2L, 20L), (3L, 21L))
        .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
      Seq((10L, 0), (11L, 0)).toDF("p_partkey", "pad")
        .write.parquet(s"$dir/part.parquet")
      // supplier 101 -> orphan nation 32
      Seq((100L, 30), (101L, 32)).toDF("s_suppkey", "s_nationkey")
        .write.parquet(s"$dir/supplier.parquet")
      // customer 20 resolves, 22 -> orphan nation 31
      Seq((20L, 30), (22L, 31)).toDF("c_custkey", "c_nationkey")
        .write.parquet(s"$dir/customer.parquet")
      // nation 33 -> orphan region 41
      Seq((30, 40), (33, 41)).toDF("n_nationkey", "n_regionkey")
        .write.parquet(s"$dir/nation.parquet")
      Seq((40, 0)).toDF("r_regionkey", "pad")
        .write.parquet(s"$dir/region.parquet")

      val got = Relational12.q146(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val expected = Seq(
        ("customer->nation", 2L, 1L, 500L),
        ("lineitem->orders", 6L, 2L, 333L),
        ("lineitem->part", 6L, 1L, 166L),
        ("lineitem->supplier", 6L, 1L, 166L),
        ("nation->region", 2L, 1L, 500L),
        ("orders->customer", 3L, 1L, 333L),
        ("supplier->nation", 2L, 1L, 500L))
      assert(got == expected)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
