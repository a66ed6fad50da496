package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EventStats, MonitoringOps, Relational10}

/** q132-q137: first-principles Scala recomputation of the decision-
  * support archetypes (Q22/Q11/Q15 shapes) and the pipeline trio
  * (integer decay, ordered funnel, MAD outliers) at sf0.01, plus the
  * plan shapes each query's scaladoc claims (pushed filters, exchange
  * reuse instead of corpus re-scans).
  */
class ArchetypePackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  import ExactModel.{cents2, lowerMedian, revU4}

  // ---------------------------------------------------------------- q132

  test("q132 equals a first-principles Q22 evaluation") {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")
      .as[(Long, Int, Double)].collect()
    val cutoff = java.sql.Timestamp.valueOf(
      s"${Relational10.DormantCutoff} 00:00:00")
    val withOrders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_custkey", $"o_orderdate")
      .as[(Long, java.sql.Timestamp)].collect()
      .collect { case (k, d) if !d.before(cutoff) => k }.toSet
    val nationName = spark.read.parquet(s"$sfDir/nation.parquet")
      .select($"n_nationkey", $"n_name").as[(Int, String)].collect().toMap

    val cents = cust.map { case (k, n, b) => (k, n, cents2(b)) }
    val pos = cents.map(_._3).filter(_ > 0)
    val thr = pos.sum / pos.length
    val dormant = cents.filter { case (k, _, c) =>
      c > thr && !withOrders.contains(k)
    }
    val expected = dormant.groupBy(c => nationName(c._2)).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum)).toSeq
      .sortBy(_._1)
      .map { case (n, (cnt, s)) => (n, cnt, s) }

    val got = Relational10.q132(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must exercise the archetype")
  }

  // ---------------------------------------------------------------- q133

  test("q133 equals a first-principles Q11 evaluation") {
    import spark.implicits._
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_suppkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double)].collect()
    val names = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap

    val rev = lines.groupBy(_._1).view
      .mapValues(_.map(l => revU4(l._2, l._3)).sum).toMap
    val total = rev.values.sum
    val n = rev.size.toLong
    val expected = rev.filter { case (_, r) => r * n > total }.toSeq
      .sortBy { case (k, r) => (-r, k) }
      .map { case (k, r) => (k, names(k), r, 1000 * r / total) }

    val got = Relational10.q133(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(expected.nonEmpty && expected.size < n,
      "the above-mean predicate must split the supplier population")
  }

  test("q133 scans lineitem once — the totals pass reuses the exchange") {
    val df = Relational10.q133(spark, sfDir)
    df.collect() // AQE resolves exchange reuse at runtime: inspect final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("StageReuse") ||
      plan.contains("ReusedQueryStage"),
      s"the 1-row totals aggregate must reuse the per-supplier " +
        s"exchange, not re-scan lineitem:\n$plan")
  }

  // ---------------------------------------------------------------- q134

  test("q134 equals a first-principles Q15 evaluation (ties kept)") {
    import spark.implicits._
    val lo = java.sql.Timestamp.valueOf("1995-03-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1995-05-30 00:00:00")
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_suppkey", $"l_extendedprice", $"l_discount", $"l_shipdate")
      .as[(Long, Double, Double, java.sql.Timestamp)].collect()
      .filter(l => !l._4.before(lo) && l._4.before(hi))
    val names = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap

    val rev = lines.groupBy(_._1).view
      .mapValues(_.map(l => revU4(l._2, l._3)).sum).toMap
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx).toSeq.sortBy(_._1)
      .map { case (k, r) => (k, names(k), r) }

    val got = Relational10.q134(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q132 pushes the recency predicate and prunes the anti-join side") {
    val plan = Relational10.q132(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      s"the recency cutoff must be a PushedFilter on the orders scan:\n$plan")
    assert("ReadSchema: struct<o_custkey:bigint,o_orderdate".r
      .findFirstIn(plan).isDefined,
      s"the anti-join side must read only (o_custkey, o_orderdate):\n$plan")
  }

  test("q134 pushes the shipdate range into the parquet scan") {
    val plan = Relational10.q134(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") &&
      plan.contains("LessThan(l_shipdate"),
      s"shipdate range must be a PushedFilter:\n$plan")
  }

  // ---------------------------------------------------------------- q135

  test("q135 equals a first-principles integer-decay evaluation") {
    import spark.implicits._
    val ev = graft.Tables.table(spark, sfDir, "events")
      .select($"event_type", $"ts", $"value")
      .as[(String, java.sql.Timestamp, Double)].collect()

    def day(t: java.sql.Timestamp): java.time.LocalDate =
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    val refD = ev.map(e => day(e._2)).max(Ordering.by[java.time.LocalDate,
      Long](_.toEpochDay))
    val rows = ev.map { case (ty, ts, v) =>
      val score = cents2(v)
      val age = refD.toEpochDay - day(ts).toEpochDay
      val shift = math.min(age / EventStats.DecayHalfLifeDays, 62L).toInt
      (ty, score, score >> shift)
    }
    val expected = rows.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum, g.map(_._3).max)
    }.toSeq.sortBy(_._1)
      .map { case (ty, (n, rs, ds, dm)) => (ty, n, rs, ds, dm) }

    val got = EventStats.q135(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    // the fixture must actually decay something, or the query under
    // test degenerates to a plain sum
    assert(expected.exists { case (_, _, raw, dec, _) => dec < raw })
  }

  // ---------------------------------------------------------------- q136

  test("q136 equals a first-principles ordered-funnel evaluation") {
    import spark.implicits._
    val ev = graft.Tables.table(spark, sfDir, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us")
      .as[(Long, String, Long)].collect()

    val W = EventStats.AttributionWindowUs
    val byUser = ev.groupBy(_._1)
    def firstIn(g: Array[(Long, String, Long)], ty: String,
        lo: Long, hi: Long): Option[Long] = {
      val c = g.collect {
        case (_, t, us) if t == ty && us > lo && us <= hi => us
      }
      if (c.isEmpty) None else Some(c.min)
    }
    val t1 = byUser.flatMap { case (u, g) =>
      firstIn(g, "view", Long.MinValue, Long.MaxValue).map(u -> _)
    }
    val t2 = t1.flatMap { case (u, t) =>
      firstIn(byUser(u), "click", t, t + W).map(u -> _)
    }
    val t3 = t2.flatMap { case (u, t) =>
      firstIn(byUser(u), "purchase", t, t + W).map(u -> _)
    }
    val n1 = t1.size.toLong
    val expected = Seq(
      (1L, "view", n1, 1000L * n1 / n1),
      (2L, "click_after_view", t2.size.toLong, 1000L * t2.size / n1),
      (3L, "purchase_after_click", t3.size.toLong, 1000L * t3.size / n1))

    val got = EventStats.q136(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // strict ordering must bite: some users have all three types but
    // not in funnel order, so stage counts strictly decrease
    assert(t2.size < n1 && t3.size < t2.size,
      s"funnel must narrow: $n1 -> ${t2.size} -> ${t3.size}")
  }

  // ---------------------------------------------------------------- q137

  test("q137 equals a first-principles median/MAD evaluation") {
    import spark.implicits._
    val vals = graft.Tables.table(spark, sfDir, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
      .map { case (ty, v) => (ty, cents2(v)) }

    val expected = vals.groupBy(_._1).view.mapValues { g =>
      val xs = g.map(_._2).toSeq
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      val out = xs.count(x => math.abs(x - med) > MonitoringOps.MadK * mad)
        .toLong
      (xs.length.toLong, med, mad, out, 1000L * out / xs.length)
    }.toSeq.sortBy(_._1)
      .map { case (ty, (n, med, mad, o, pm)) => (ty, n, med, mad, o, pm) }

    val got = MonitoringOps.q137(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(expected.exists(_._5 > 0),
      "fixture must contain at least one MAD outlier")
  }

  test("q137 runs as ONE histogram fold: a single events scan, no " +
    "window operators, no joins (r17 optimization: the 16-exchange " +
    "median/MAD/outlier cascade collapsed into expression folds over " +
    "the value-domain-bounded sorted histogram)") {
    val df = MonitoringOps.q137(spark, sfDir)
    // node-tree walk of the PRE-runtime plan, not a plan-string grep
    // (AQE's toString prints Final AND Initial plans, double-counting)
    // and not post-collect (materialized QueryStageExec nodes are
    // leaves, hiding their subtrees from a children walk). The fold
    // shape has a single consumer, so the static plan is deterministic.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case o => o +: (o.children.flatMap(flatten) ++
        o.subqueries.flatMap(flatten))
    }
    val ns = flatten(df.queryExecution.executedPlan)
    def names = ns.map(_.getClass.getSimpleName)
    val scans = names.count(n =>
      n == "FileSourceScanExec" || n == "BatchScanExec")
    assert(scans == 1, s"q137 must scan events exactly once, got $scans:\n" +
      s"${df.queryExecution.executedPlan}")
    assert(!names.exists(_.contains("Join")),
      s"q137 regressed to a join cascade:\n${df.queryExecution.executedPlan}")
    assert(!ns.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"q137 regressed to window operators:\n${df.queryExecution.executedPlan}")
  }
}
