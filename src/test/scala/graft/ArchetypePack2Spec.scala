package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusHygieneOps, EventStats, Relational11}

/** q138-q143: first-principles Scala recomputation of the per-group
  * threshold archetypes (Q17 decorrelation, dominant supplier) and the
  * event/text monitoring pack (burst detection, transitions, shingle
  * uniqueness, gap histogram) at sf0.01, plus the plan shapes the
  * scaladocs claim (single-scan decorrelation, aggregate-then-window).
  */
class ArchetypePack2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  import ExactModel.revU4

  /** (us, ms, event_type) per user, ordered by (us, event_id) — the
    * shared per-user timeline model for q141/q143. Ordering uses the
    * MICROSECOND timestamp because the queries window on the full-
    * precision ts column; a millisecond-truncated sort key would
    * tie-break same-ms events by event_id where the queries still see
    * distinct sub-ms timestamps. Gap values stay in ms (the queries'
    * unix_millis contract).
    */
  private lazy val timelines: Map[Long, Seq[(Long, Long, String)]] = {
    import spark.implicits._
    graft.Tables.table(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts)", "unix_millis(ts)",
        "event_id", "event_type")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2, e._4)).map(e => (e._2, e._3, e._5)).toSeq)
      .toMap
  }

  // ---------------------------------------------------------------- q138

  test("q138 equals a first-principles correlated Q17 evaluation") {
    import spark.implicits._
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_returnflag", $"l_quantity",
        $"l_extendedprice", $"l_discount")
      .as[(Long, String, Double, Double, Double)].collect()
    val perPart = lines.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._3.toLong).sum)
    }.toMap
    val qualifying = lines.filter { case (p, _, q, _, _) =>
      val (cnt, sumQty) = perPart(p)
      5L * q.toLong * cnt < sumQty
    }
    val expected = qualifying.groupBy(_._2).view.mapValues { g =>
      (g.length.toLong, g.map(l => revU4(l._4, l._5)).sum)
    }.toSeq.sortBy(_._1).map { case (f, (n, r)) => (f, n, r) }

    val got = Relational11.q138(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty && qualifying.nonEmpty,
      "fixture must exercise the archetype")
  }

  test("q138's decorrelated plan scans lineitem exactly once") {
    val plan = Relational11.q138(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one lineitem scan, got $scans:\n$plan")
  }

  // ---------------------------------------------------------------- q139

  test("q139 equals a first-principles dominance evaluation") {
    import spark.implicits._
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .as[(Long, Long, Double)].collect()
    val pairQty = lines.groupBy(l => (l._1, l._2)).view
      .mapValues(_.map(_._3.toLong).sum).toMap
    val partStats = pairQty.groupBy(_._1._1).view.mapValues { g =>
      (g.values.sum, g.size.toLong)
    }.toMap
    val expected = pairQty.toSeq.flatMap { case ((p, s), q) =>
      val (tot, n) = partStats(p)
      if (n >= 2 && q * n > Relational11.DominanceNum * tot)
        Some((p, s, q, n, 1000L * q / tot))
      else None
    }.sortBy { case (p, s, _, _, share) => (-share, p, s) }.take(100)

    val got = Relational11.q139(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must exercise the archetype")
  }

  // ---------------------------------------------------------------- q140

  test("q140 equals a first-principles trailing-window evaluation") {
    import spark.implicits._
    val hours = graft.Tables.table(spark, sfDir, "events")
      .selectExpr("event_type", "unix_millis(ts) div 3600000")
      .as[(String, Long)].collect()
    val counts = hours.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val expected = counts.keys.toSeq.sorted.flatMap { case (t, hr) =>
      val prior = ((hr - EventStats.BurstTrailingHours) until hr)
        .flatMap(h => counts.get((t, h)))
      val cnt = counts((t, hr))
      if (prior.length >= EventStats.BurstMinPrior &&
        2L * cnt * prior.length > 3L * prior.sum)
        Some((t, hr, cnt, prior.length.toLong, prior.sum))
      else None
    }

    val got = EventStats.q140(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must contain bursts")
  }

  // ---------------------------------------------------------------- q141

  test("q141 equals a first-principles transition count") {
    val trans = timelines.values.flatMap { tl =>
      tl.map(_._3).sliding(2).collect { case Seq(a, b) => (a, b) }
    }.toSeq
    val counts = trans.groupBy(identity).view.mapValues(_.length.toLong)
    val total = trans.length.toLong
    val expected = counts.toSeq.sortBy(_._1)
      .map { case ((a, b), n) => (a, b, n, 1000L * n / total) }

    val got = EventStats.q141(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must contain transitions")
    // the share column must account for every transition exactly once
    assert(got.map(_._3).sum == total)
  }

  // ---------------------------------------------------------------- q142

  test("q142 equals a first-principles uniqueness score") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sets = docs.map { case (id, t) => id -> ShingleModel.shingleSet(t) }
      .filter(_._2.nonEmpty)
    val df = sets.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length).toMap
    val expected = sets.map { case (id, hs) =>
      val uniq = hs.count(df(_) == 1).toLong
      (id, hs.size.toLong, uniq, 1000L * uniq / hs.size)
    }.sortBy { case (id, _, _, p) => (p, id) }
      .take(CorpusHygieneOps.UniqTopK).toSeq

    val got = CorpusHygieneOps.q142(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the screen must actually separate docs (not a constant column)
    assert(expected.map(_._4).distinct.size > 1,
      "fixture must spread uniqueness scores")
  }

  // ---------------------------------------------------------------- q143

  test("q143 equals a first-principles gap histogram") {
    val gaps = timelines.values.flatMap { tl =>
      tl.map(_._2).sliding(2).collect { case Seq(a, b) => (b - a) / 1000L }
    }.toSeq
    val expected = gaps.groupBy(g => java.lang.Long.toBinaryString(g).length)
      .toSeq.sortBy(_._1)
      .map { case (b, g) => (b.toLong, g.length.toLong, g.min, g.max) }

    val got = EventStats.q143(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // buckets must partition the gaps: counts sum to the gap count
    assert(got.map(_._2).sum == gaps.length.toLong)
    assert(expected.size > 1, "fixture must spread gap magnitudes")
  }
}
