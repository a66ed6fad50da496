package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Advanced, EmbeddingOps, MixtureOps, TextAnalysis}

/** q215 dynamic partition pruning (plan marker + plain-join identity)
  * and q217 FORCAST readability (first-principles recompute).
  */
class LayoutTextPcaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val sfDir = "/root/testdata/sf0.001"

  test("q215 executes with a dynamicpruning partition filter in the plan") {
    // DPP's reuse path rides the broadcast exchange of the dim side, so
    // this test needs broadcast joins ON even if an earlier suite in the
    // shared test JVM disabled them (save/restore, ScaleProofSpec style).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      val df = Advanced.q215(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamicpruning partition filter in:\n$plan")

      // layout + DPP must be a pure physical choice: identical rows to
      // the plain join over the original parquet
      val plain = spark.read.parquet(s"$sfDir/customer.parquet")
        .join(
          spark.read.parquet(s"$sfDir/nation.parquet")
            .filter(col("n_regionkey") === 1),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_custs"),
          round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
        .orderBy(col("n_name"))
      assert(df.collect().toSeq == plain.collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q217 matches a first-principles FORCAST recompute") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vowelRuns = "[aeiouy]+".r
    val perDoc = docs.map { case (lang, text) =>
      val toks = text.split(' ').filter(_.nonEmpty)
      val sylls = toks.map(t => vowelRuns.findAllIn(t).size.toLong)
      val words = toks.length.toLong
      val mono = sylls.count(_ == 1L).toLong
      (lang, words, sylls.sum, mono, 20000L - (15000L * mono) / words)
    }
    val expected = perDoc.groupBy(_._1).map { case (lang, rows) =>
      val n = rows.length.toLong
      val words = rows.map(_._2).sum
      val mono = rows.map(_._4).sum
      (lang, n, words, rows.map(_._3).sum, mono,
        1000L * mono / words, rows.map(_._5).sum / n)
    }.toSeq.sortBy(_._1)

    val got = TextAnalysis.q217(spark, sfDir).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got == expected)
  }

  test("q219 captures the dominant variance direction of the quantized cloud") {
    val rows = EmbeddingOps.q219(spark, sfDir).collect()
    val dims = rows.map(_.getLong(0))
    val v = rows.sortBy(_.getLong(0)).map(_.getLong(1).toDouble)
    assert(dims.sorted.sameElements(dims), "ordered by dim")
    assert(dims.toSeq == (0L until dims.length.toLong),
      "one row per dimension, 0-based")
    // renorm invariant: the last iteration pins max|component| to the
    // fixed-point scale, and sign canonicalization makes it positive
    assert(v.map(math.abs).max == EmbeddingOps.PcaVScale.toDouble)
    assert(v(v.indexWhere(x =>
      math.abs(x) == EmbeddingOps.PcaVScale.toDouble)) > 0)

    // Rayleigh quotient vs a long double-precision power iteration on
    // the exact centered covariance of the same quantized vectors —
    // robust to near-equal eigenvalues where a direction compare isn't
    val qs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr(
        "transform(embedding, e -> cast(floor(cast(e as double) * 128) as bigint))")
      .collect().map(_.getSeq[Long](0).toArray)
    val n = qs.length
    val d = qs(0).length
    val s = Array.tabulate(d)(i => qs.map(_(i)).sum)
    val c = Array.tabulate(d, d)((i, j) =>
      (n.toLong * qs.map(q => q(i) * q(j)).sum - s(i) * s(j)).toDouble)
    def rayleigh(x: Array[Double]): Double = {
      val nrm = math.sqrt(x.map(a => a * a).sum)
      val u = x.map(_ / nrm)
      val cu = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * u(j)).sum)
      u.zip(cu).map { case (a, b) => a * b }.sum
    }
    var ref = Array.fill(d)(1.0)
    (1 to 500).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * ref(j)).sum)
      val m = w.map(math.abs).max
      ref = w.map(_ / m)
    }
    assert(rayleigh(v) > 0, "a real variance direction")
    assert(rayleigh(v) >= 0.9 * rayleigh(ref),
      s"rayleigh ${rayleigh(v)} vs reference ${rayleigh(ref)}")
  }

  test("q225 matches a first-principles water-filling allocator") {
    import spark.implicits._
    val caps = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"source", $"text").as[(String, String)].collect()
      .map { case (s, t) =>
        (s, t.split(" ").count(_.nonEmpty).toLong)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = caps.values.sum
    val b = MixtureOps.Q225BudgetNum * total / 10
    // reference water level: largest L with sum(min(c, L)) <= b, found
    // by scanning L from 0 (the domain is small at sf0.001)
    def used(l: Long): Long = caps.values.map(math.min(_, l)).sum
    val allCapped = total <= b
    val lvl = if (allCapped) -1L
      else (0L to caps.values.max).takeWhile(used(_) <= b).last
    val expected = caps.map { case (s, c) =>
      val alloc = if (allCapped) c else math.min(c, lvl)
      s -> ((c, alloc, alloc == c, 1000L * alloc / c))
    }

    val got = MixtureOps.q225(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (c, alloc, capped, rate) = expected(r.getString(0))
      assert(r.getLong(1) == c, s"tokens_available(${r.getString(0)})")
      assert(r.getLong(2) == alloc, s"tokens_allocated(${r.getString(0)})")
      assert(r.getBoolean(3) == capped, s"is_capped(${r.getString(0)})")
      assert(r.getLong(4) == rate, s"rate_permille(${r.getString(0)})")
    }
    // allocator contract: within budget, and the level is MAXIMAL
    val allocTotal = got.map(_.getLong(2)).sum
    assert(allocTotal <= b, s"allocated $allocTotal > budget $b")
    if (!allCapped) assert(used(lvl + 1) > b, "level not maximal")
    // balanced corpus sources exercise only the at-level regime here;
    // the skewed-fixture test below covers capped + cut together
  }

  test("q225 waterFill: skewed fixture exercises capped AND cut regimes") {
    import spark.implicits._
    // capacities 10/20/1000, budget 60% of 1030 = 618:
    // cut = 2 (10 and 20 fully taken), level = (618-30)/1 = 588
    val caps = Seq(("small", 10L), ("mid", 20L), ("huge", 1000L))
      .toDF("source", "c")
    val got = graft.queries.MixtureOps.waterFill(caps, 6L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(got("small") == ((10L, 10L, true, 1000L)))
    assert(got("mid") == ((20L, 20L, true, 1000L)))
    assert(got("huge") == ((1000L, 588L, false, 588L)))
    // maximality: raising the level by 1 would break the budget
    assert(10 + 20 + 589 > 618)
    // all-capped regime: budget covers everything
    val full = graft.queries.MixtureOps.waterFill(caps, 10L)
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(full.forall(_._2) && full.map(_._1).sum == 1030L)
  }

  test("q227 manifest is consistent with q225 and tracks the allocation") {
    val alloc = MixtureOps.q225(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    val got = MixtureOps.q227(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == alloc.keySet)
    got.foreach { r =>
      val (avail, allocated, rate) = alloc(r.getString(0))
      assert(r.getLong(1) == avail, s"tokens_available(${r.getString(0)})")
      assert(r.getLong(2) == allocated, s"tokens_allocated(${r.getString(0)})")
      assert(r.getLong(3) == rate, s"rate_permille(${r.getString(0)})")
      // sampled volumes are internally consistent
      assert(r.getLong(5) <= r.getLong(4), "n_sampled <= n_docs")
      assert(r.getLong(6) <= r.getLong(1), "sampled_tokens <= available")
      assert(r.getLong(7) == 1000L * r.getLong(6) / r.getLong(1))
      // the hash-rate sampler tracks the target in expectation; a
      // per-source band only means anything on a real panel (sf0.001
      // sources hold tens of docs — binomial noise swamps a tight band)
      if (r.getLong(4) >= 200)
        assert(math.abs(r.getLong(7) - rate) <= 150,
          s"achieved ${r.getLong(7)} vs target $rate for ${r.getString(0)}")
    }
    // corpus-level tracking: aggregate sampled tokens within ±25% of
    // the aggregate allocation (larger n → tighter concentration)
    val sampledTotal = got.map(_.getLong(6)).sum
    val allocTotal = got.map(_.getLong(2)).sum
    assert(math.abs(sampledTotal - allocTotal) <= allocTotal / 4,
      s"sampled $sampledTotal vs allocated $allocTotal")
  }

  test("q223 matches a first-principles bigram-LM scorer") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("string"), $"lang", $"text")
      .as[(String, String, String)].collect()
      .map { case (id, lang, t) =>
        (id, lang, t.split(" ").filter(_.nonEmpty).toSeq)
      }
    val bigrams = docs.flatMap { case (id, lang, toks) =>
      toks.zip(toks.drop(1)).map(bg => (id, lang, bg))
    }
    val bc = bigrams.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ctx = bc.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    def log2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val perDoc = bigrams.groupBy(b => (b._1, b._2)).map {
      case ((_, lang), bs) =>
        val ss = bs.map { case (_, _, bg) =>
          (log2(ctx(bg._1)) - log2(bc(bg))).toLong
        }.sum
        (lang, bs.length.toLong, ss)
    }.toSeq
    val expected = perDoc.groupBy(_._1).map { case (lang, ds) =>
      lang -> ((ds.size.toLong, ds.map(_._2).sum,
        1000L * ds.map(_._3).sum / ds.map(_._2).sum,
        ds.map(d => 1000L * d._3 / d._2).max))
    }

    val got = TextAnalysis.q223(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (nd, nb, corpus, mx) = expected(r.getString(0))
      assert(r.getLong(1) == nd, s"n_docs(${r.getString(0)})")
      assert(r.getLong(2) == nb, s"n_bigrams(${r.getString(0)})")
      assert(r.getLong(3) == corpus, s"corpus_surp_permille(${r.getString(0)})")
      assert(r.getLong(4) == mx, s"max_doc_permille(${r.getString(0)})")
    }
  }
}
