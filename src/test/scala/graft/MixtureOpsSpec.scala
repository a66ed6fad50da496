package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MixtureOps

/** Semantic assertions for the q106-q109 pack: the map-only shape of
  * rate sampling (q106), retention-matrix structure (q107), the
  * Hamilton apportionment exact-total property (q108), and shard
  * packing's conservation/contiguity plus the two-level-scan ≡ flat
  * -cumsum equivalence (q109).
  */
class MixtureOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private val sfDir01 = "/root/testdata/sf0.01"

  test("q106: the corpus path is map-only — no window, no sort-merge join") {
    val plan = MixtureOps.q106(spark, sfDir01).queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"), s"rate sampling must not rank:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"rates must broadcast, the corpus must not shuffle into a join:\n$plan")
  }

  test("q106: kept counts are bounded and land near the flattening target") {
    val rows = MixtureOps.q106(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    val m = rows.map(_.getAs[Long]("n_total")).min
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept <= r.getAs[Long]("n_total"))
      // Bernoulli(m/c) over c docs: expect m ± a generous 6σ — this is
      // a determinism fixture, not a statistics test (σ ≤ √m/2 ≈ 2.5
      // at m = 25), but a systematic rate bug (e.g. < vs <=) walks far
      // outside this band
      assert(math.abs(kept - m) <= 6 * math.sqrt(m.toDouble),
        s"source ${r.getAs[String]("source")}: kept $kept, target $m")
    }
  }

  test("q107: retention matrix is triangular and age 0 covers every cohort user") {
    val rows = MixtureOps.q107(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("age_days") >= 0))
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_day"))
    byCohort.foreach { case (cd, rs) =>
      val age0 = rs.filter(_.getAs[Long]("age_days") == 0).map(_.getAs[Long]("n_users")).sum
      assert(age0 > 0, s"cohort $cd has no age-0 row (cohort day IS a purchase day)")
      // no later age can exceed the cohort's own size
      rs.foreach(r => assert(r.getAs[Long]("n_users") <= age0,
        s"cohort $cd age ${r.getAs[Long]("age_days")} outnumbers the cohort"))
    }
    // cohort sizes sum to the distinct purchasing-user population
    val totalUsers = graft.Tables.table(spark, sfDir01, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    val cohortSum = byCohort.values
      .map(_.filter(_.getAs[Long]("age_days") == 0).map(_.getAs[Long]("n_users")).sum).sum
    assert(cohortSum == totalUsers, "every purchasing user is in exactly one cohort")
  }

  test("q108: quotas sum to the budget exactly and selection honors them") {
    val rows = MixtureOps.q108(spark, sfDir01).collect()
    assert(rows.map(_.getAs[Long]("quota")).sum == MixtureOps.EvalBudget.toLong,
      "Hamilton apportionment must hit the budget exactly")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_selected") == r.getAs[Long]("quota"),
        s"selection must fill the quota for ${r.getAs[String]("source")}")
      // quota is base or base+1: within 1 of the proportional share
      val (c, q) = (r.getAs[Long]("n_total"), r.getAs[Long]("quota"))
      val t = rows.map(_.getAs[Long]("n_total")).sum
      val share = MixtureOps.EvalBudget.toDouble * c / t
      assert(q >= math.floor(share) && q <= math.floor(share) + 1,
        s"quota $q strays from proportional share $share")
    }
  }

  test("q109: shards conserve the corpus, are contiguous, and respect the budget") {
    val rows = MixtureOps.q109(spark, sfDir01).collect()
    assert(rows.length > 1, "fixture corpus must span multiple shards")
    val docs = graft.Tables.table(spark, sfDir01, "documents")
      .select(expr("size(filter(split(text, ' '), t -> t <> ''))")
        .cast("long").as("n"))
    val (totalDocs, totalToks, maxTok) =
      (docs.count(), docs.agg(sum("n")).head.getLong(0),
        docs.agg(max("n")).head.getLong(0))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    assert(rows.map(_.getAs[Long]("tok_sum")).sum == totalToks)
    val sorted = rows.sortBy(_.getAs[Long]("shard_id"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"),
          "shards are contiguous, disjoint doc_id ranges")
      case _ =>
    }
    sorted.foreach { r =>
      assert(r.getAs[Long]("tok_sum") < MixtureOps.ShardTokens + maxTok,
        "a shard overflows by less than one document")
    }
    sorted.dropRight(1).foreach { r =>
      assert(r.getAs[Long]("tok_sum") > MixtureOps.ShardTokens - maxTok,
        "a closed shard is full up to one document")
    }
  }

  test("q109: the two-level scan equals the flat global cumsum") {
    // the scale-shaped prefix sum must be value-identical to the naive
    // single-window formulation it replaces
    val docs = graft.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n_tokens"))
    val flat = docs
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("shard_id", expr(s"cum_before DIV ${MixtureOps.ShardTokens}"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))
      .collect()
    val twoLevel = MixtureOps.q109(spark, sfDir).collect()
    assert(twoLevel.map(_.toString).toSeq == flat.map(_.toString).toSeq)
  }

  test("q125: weights follow the exact importance formula and rebalance the mix") {
    val rows = MixtureOps.q125(spark, sfDir01).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nLangs = rows.length.toLong
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val expected = math.min(1000L,
        (MixtureOps.ImpBasePermille * total) / (nLangs * n))
      assert(r.getAs[Long]("weight_permille") == expected,
        s"${r.getAs[String]("lang")}: weight formula mismatch")
      // Bernoulli(w/1000) over n docs: 6 sigma determinism band
      val acc = r.getAs[Long]("n_accepted")
      val exp = expected.toDouble * n / 1000.0
      assert(math.abs(acc - exp) <= 6 * math.sqrt(exp),
        s"${r.getAs[String]("lang")}: accepted $acc, expected ~$exp")
    }
    // the resample moves the language mix TOWARD uniform: total
    // variation distance to the uniform target must strictly shrink
    // (sf0.01 is en-heavy, so there is real distance to close)
    val accTotal = rows.map(_.getAs[Long]("n_accepted")).sum
    def tvd(shares: Seq[Double]) = shares.map(s => math.abs(s - 1.0 / nLangs)).sum / 2
    val pre = tvd(rows.map(_.getAs[Long]("n_docs").toDouble / total).toSeq)
    val post = tvd(rows.map(_.getAs[Long]("n_accepted").toDouble / accTotal).toSeq)
    assert(post < pre, s"resample must rebalance: pre-TVD $pre, post-TVD $post")
    assert(post < 0.02, s"post-sample mix should be near-uniform, TVD $post")
  }

  test("q125: the corpus acceptance pass broadcast-joins the weight table") {
    val plan = MixtureOps.q125(spark, sfDir01).queryExecution.sparkPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never shuffle into the weight join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast to the acceptance scan:\n$plan")
  }
}
