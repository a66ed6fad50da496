package graft

import java.time.ZoneOffset

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Relational13, Relational14}

/** q148-q155: first-principles Scala recomputation of the star-join
  * archetypes (Q5/Q7/Q8/Q10/Q13/Q14/Q18/Q19 shapes) at sf0.01, plus the
  * plan shapes each query's scaladoc claims (broadcast prunes before the
  * wide shuffles, pushed scan filters, TakeOrderedAndProject top-k).
  */
class ArchetypePack4Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  import ExactModel.{cents2, revU4}

  private def utcYear(ts: java.sql.Timestamp): Long =
    ts.toInstant.atZone(ZoneOffset.UTC).getYear.toLong

  // Shared dimension loads (tiny): key → name / region maps.
  private lazy val nationName: Map[Int, String] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/nation.parquet")
      .select($"n_nationkey", $"n_name").as[(Int, String)].collect().toMap
  }
  private lazy val nationRegion: Map[Int, String] = {
    import spark.implicits._
    val regionName = spark.read.parquet(s"$sfDir/region.parquet")
      .select($"r_regionkey", $"r_name").as[(Int, String)].collect().toMap
    spark.read.parquet(s"$sfDir/nation.parquet")
      .select($"n_nationkey", $"n_regionkey").as[(Int, Int)].collect()
      .map { case (n, r) => n -> regionName(r) }.toMap
  }
  private lazy val suppNation: Map[Long, Int] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_suppkey", $"s_nationkey").as[(Long, Int)].collect().toMap
  }
  private lazy val custNation: Map[Long, Int] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_nationkey").as[(Long, Int)].collect().toMap
  }
  /** orderkey → (custkey, order ts). */
  private lazy val orderInfo: Map[Long, (Long, java.sql.Timestamp)] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .map { case (o, c, d) => o -> (c, d) }.toMap
  }
  /** (orderkey, suppkey, partkey, qty, price, disc, shipdate). */
  private lazy val lines: Array[(Long, Long, Long, Double, Double, Double,
      java.sql.Timestamp)] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey", $"l_partkey", $"l_quantity",
        $"l_extendedprice", $"l_discount", $"l_shipdate")
      .as[(Long, Long, Long, Double, Double, Double, java.sql.Timestamp)]
      .collect()
  }

  // ---------------------------------------------------------------- q148

  test("q148 equals a first-principles Q5 evaluation (cyclic constraint)") {
    val expected = lines.flatMap { case (ok, sk, _, _, price, disc, _) =>
      val (ck, od) = orderInfo(ok)
      val sn = suppNation(sk)
      if (custNation(ck) == sn &&
        nationRegion(sn) == Relational13.LocalVolumeRegion)
        Some(((nationName(sn), utcYear(od)), revU4(price, disc)))
      else None
    }.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toSeq
      .map { case ((n, y), (r, c)) => (n, y, r, c) }
      .sortBy { case (n, y, r, _) => (y, -r, n) }

    val got = Relational13.q148(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must exercise the archetype")
  }

  test("q148 prunes lineitem with a broadcast supplier join before the " +
    "orderkey shuffle") {
    val plan = Relational13.q148(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"region-supplier prune must broadcast:\n$plan")
  }

  // ---------------------------------------------------------------- q149

  test("q149 equals a first-principles Q7 evaluation (both directions)") {
    val pair = Set(Relational13.TradeNationA, Relational13.TradeNationB)
    val expected = lines.flatMap { case (ok, sk, _, _, price, disc, ship) =>
      val sn = nationName(suppNation(sk))
      val cn = nationName(custNation(orderInfo(ok)._1))
      if (pair.contains(sn) && pair.contains(cn) && sn != cn)
        Some(((sn, cn, utcYear(ship)), revU4(price, disc)))
      else None
    }.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toSeq
      .map { case ((s, c, y), (r, n)) => (s, c, y, r, n) }
      .sortBy { case (s, c, y, _, _) => (s, c, y) }

    val got = Relational13.q149(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // both directions must appear, else the pair filter is one-sided
    assert(got.map(_._1).distinct.sorted ==
      Seq(Relational13.TradeNationA, Relational13.TradeNationB).sorted)
  }

  // ---------------------------------------------------------------- q150

  test("q150 equals a first-principles Q8 evaluation (conditional share)") {
    import spark.implicits._
    val promo = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey", $"p_type").as[(Long, String)].collect()
      .collect { case (k, t) if t == Relational13.MarketPartType => k }.toSet
    val byYear = lines.flatMap { case (ok, sk, pk, _, price, disc, _) =>
      val (ck, od) = orderInfo(ok)
      if (promo.contains(pk) &&
        nationRegion(custNation(ck)) == Relational13.MarketRegion)
        Some((utcYear(od), nationName(suppNation(sk)), revU4(price, disc)))
      else None
    }.groupBy(_._1)
    val expected = byYear.view.mapValues { g =>
      val mkt = g.map(_._3).sum
      val share = g.filter(_._2 == Relational13.ShareNation).map(_._3).sum
      (share, mkt, 1000 * share / mkt)
    }.toSeq.map { case (y, (s, m, p)) => (y, s, m, p) }.sortBy(_._1)

    val got = Relational13.q150(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(expected.exists(_._2 > 0),
      "share nation must supply the market at this SF")
  }

  // ---------------------------------------------------------------- q151

  test("q151 equals a first-principles Q10 evaluation (top-k cut)") {
    import spark.implicits._
    // UTC-parsed bounds: Timestamp.valueOf would use the JVM default
    // timezone while the query under test parses these literals in the
    // UTC session timezone — on a non-UTC host the two windows diverge
    def utcTs(d: String): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.LocalDate.parse(d).atStartOfDay(ZoneOffset.UTC).toInstant)
    val lo = utcTs(Relational13.ReturnsFrom)
    val hi = utcTs(Relational13.ReturnsUntil)
    val returned = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_returnflag", $"l_extendedprice", $"l_discount")
      .as[(Long, String, Double, Double)].collect()
      .filter(_._2 == "R")
    val custName = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_name").as[(Long, String)].collect().toMap

    val expected = returned.flatMap { case (ok, _, price, disc) =>
      val (ck, od) = orderInfo(ok)
      if (!od.before(lo) && od.before(hi)) Some((ck, revU4(price, disc)))
      else None
    }.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toSeq
      .map { case (ck, (r, n)) =>
        (ck, custName(ck), nationName(custNation(ck)), r, n)
      }
      .sortBy { case (ck, _, _, r, _) => (-r, ck) }
      .take(Relational13.ReturnsTopK)

    val got = Relational13.q151(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.size == Relational13.ReturnsTopK)
  }

  test("q151 pushes both fact filters and ranks via TakeOrderedAndProject") {
    val plan = Relational13.q151(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"returnflag must be a PushedFilter on the lineitem scan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThan(o_orderdate"),
      s"the date window must be a PushedFilter on the orders scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-k must never globally sort:\n$plan")
  }

  // ---------------------------------------------------------------- q152

  test("q152 equals a first-principles Q13 evaluation (zero bucket kept)") {
    import spark.implicits._
    val urgentPerCust = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_custkey", $"o_orderpriority").as[(Long, String)].collect()
      .filter(_._2 == Relational14.DistPriority)
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = custNation.keys.toSeq
      .map(ck => urgentPerCust.getOrElse(ck, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case (k, d) => (k, d) }
      .sortBy { case (k, d) => (-d, -k) }

    val got = Relational14.q152(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(got.exists(_._1 == 0L),
      "the zero bucket must exist — it is what the left join is for")
  }

  // ---------------------------------------------------------------- q153

  test("q153 equals a first-principles Q14 evaluation (integer permille)") {
    import spark.implicits._
    val promo = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey", $"p_type").as[(Long, String)].collect()
      .collect { case (k, t) if t == Relational14.PromoType => k }.toSet
    val expected = lines.flatMap { case (_, _, pk, _, price, disc, ship) =>
      val zdt = ship.toInstant.atZone(ZoneOffset.UTC)
      if (zdt.getYear == Relational14.PromoYear)
        Some((zdt.getYear * 100L + zdt.getMonthValue,
          promo.contains(pk), revU4(price, disc)))
      else None
    }.groupBy(_._1).view.mapValues { g =>
      val total = g.map(_._3).sum
      val p = g.filter(_._2).map(_._3).sum
      (p, total, 1000 * p / total)
    }.toSeq.map { case (ym, (p, t, pm)) => (ym, p, t, pm) }.sortBy(_._1)

    val got = Relational14.q153(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(got.size == 12, "every month of the reporting year must appear")
  }

  test("q153 pushes the ship-year range into the lineitem scan") {
    val plan = Relational14.q153(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"),
      s"the year-as-range filter must be a PushedFilter:\n$plan")
  }

  // ---------------------------------------------------------------- q154

  test("q154 equals a first-principles Q18 evaluation (exact threshold)") {
    import spark.implicits._
    val custName = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_name").as[(Long, String)].collect().toMap
    val orderPrice = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)].collect()
      .toMap
    val expected = lines.groupBy(_._1).view
      .mapValues(_.map(_._4.toLong).sum).toSeq
      .filter(_._2 > Relational14.BigSpenderQty)
      .map { case (ok, q) =>
        val (ck, od) = orderInfo(ok)
        (ck, custName(ck), ok,
          od.toInstant.atZone(ZoneOffset.UTC).toLocalDate.toString,
          cents2(orderPrice(ok)), q)
      }
      .sortBy { case (_, _, ok, _, _, q) => (-q, ok) }

    val got = Relational14.q154(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDate(3).toString, r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "the qty tail must exist at this SF")
  }

  // ---------------------------------------------------------------- q155

  test("q155 equals a first-principles Q19 evaluation (OR-of-ANDs)") {
    import spark.implicits._
    val partInfo = spark.read.parquet(s"$sfDir/part.parquet")
      .select($"p_partkey", $"p_brand", $"p_size")
      .as[(Long, String, Int)].collect()
      .map { case (k, b, s) => k -> (b, s) }.toMap
    def matches(pk: Long, qty: Double): Option[String] = {
      val (brand, size) = partInfo(pk)
      val hit = Relational14.Brackets.exists {
        case (b, sLo, sHi, qLo, qHi) =>
          brand == b && size >= sLo && size <= sHi && qty >= qLo && qty <= qHi
      }
      if (hit) Some(brand) else None
    }
    val expected = lines.flatMap { case (_, _, pk, qty, price, disc, _) =>
      matches(pk, qty).map(b => (b, revU4(price, disc)))
    }.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).sum, g.length.toLong)).toSeq
      .map { case (b, (r, n)) => (b, r, n) }.sortBy(_._1)

    val got = Relational14.q155(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.size == Relational14.Brackets.size,
      "every bracket must match rows at this SF")
  }

  test("q155 pushes the per-table disjunctions into both scans") {
    val plan = Relational14.q155(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Or(And(EqualTo(p_brand"),
      s"the (brand AND size) disjunction must be a PushedFilter on part:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_quantity") &&
      plan.contains("LessThanOrEqual(l_quantity"),
      s"the union qty range must be a PushedFilter on lineitem:\n$plan")
  }
}
