package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Dedup, EventStats, MixtureOps, Relational6}

/** Invariants for the round-2 pipeline operators beyond the oracle gate:
  * quantization reconstruction bounds, sampling determinism, blocklist
  * completeness, and the physical-plan shapes that make them scale.
  */
class CurationPrimitivesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------- q50

  test("int8 quantization stays within [-127, 127] and reconstructs within half a step") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("vd", expr("transform(embedding, e -> cast(e as double))"))
      .withColumn("maxabs",
        expr("aggregate(vd, 0d, (acc, e) -> greatest(acc, abs(e)))"))
      .withColumn("scale", lit(127.0) / greatest(col("maxabs"), lit(1e-30)))
      .withColumn("q",
        expr("transform(vd, e -> cast(floor(e * scale + 0.5d) as bigint))"))
      .select(
        expr("array_max(transform(q, e -> abs(e)))").as("qmax"),
        // worst per-element reconstruction error, in original units
        expr("""aggregate(zip_with(vd, q, (e, qq) -> abs(e - qq / scale)),
                0d, (a, x) -> greatest(a, x))""").as("err"),
        col("scale"))
      .as[(Long, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qmax, err, scale) =>
      assert(qmax <= 127L, s"quantized magnitude $qmax exceeds int8 range")
      // round-half-up: reconstruction error is at most half a quant step
      assert(err <= 0.5 / scale + 1e-12,
        s"reconstruction error $err exceeds half step ${0.5 / scale}")
    }
  }

  // ------------------------------------------------------------- q56

  test("stratified sample is deterministic and rate-ordered across runs") {
    val a = MixtureOps.q56(spark, sfDir).collect().toSeq
    val b = MixtureOps.q56(spark, sfDir).collect().toSeq
    assert(a == b, "hash sampling must be bit-stable across runs")
    // en is downsampled at 30%, zh kept at 90%: relative retention must
    // reflect the configured rates on any non-trivial corpus
    val total = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = a.map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- sampled) {
      assert(n <= total(lang), s"$lang sampled more rows than exist")
    }
  }

  // ------------------------------------------------------------- q57

  test("blocklist anti-join removes every blocked text and nothing else") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val blockedTexts = docs.filter(col("source").isin("src0", "src1"))
      .select(md5(col("text")).as("bh")).distinct().collect()
      .map(_.getString(0)).toSet
    val keptHashes = docs
      .join(
        broadcast(docs.filter(col("source").isin("src0", "src1"))
          .select(md5(col("text")).as("bh")).distinct()),
        md5(col("text")) === col("bh"), "left_anti")
      .select(md5(col("text")).as("h")).collect().map(_.getString(0)).toSet
    assert(keptHashes.intersect(blockedTexts).isEmpty,
      "a blocked fingerprint survived the anti join")
    val allHashes = docs.select(md5(col("text")).as("h"))
      .collect().map(_.getString(0)).toSet
    assert(keptHashes == allHashes -- blockedTexts,
      "anti join dropped rows that were not on the blocklist")
  }

  test("q57 compiles to a broadcast left-anti hash join (no corpus shuffle)") {
    val plan = Dedup.q57(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti join in:\n$plan")
  }

  // ------------------------------------------------------------- q55

  test("gap-fill spine emits every hour x type cell exactly once") {
    val df = Relational6.q55(spark, sfDir)
    val n = df.count()
    val hours = df.select("hour").distinct().count()
    val types = df.select("event_type").distinct().count()
    assert(n == hours * types, s"spine not dense: $n != $hours*$types")
    assert(df.groupBy("hour", "event_type").count()
      .filter(col("count") > 1).isEmpty, "duplicate spine cells")
  }

  // ------------------------------------------------------------- q58

  test("time-weighted average falls inside the per-user value range") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("user_id") % 5 === 0)
    val bounds = ev.groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val bad = EventStats.q58(spark, sfDir)
      .join(bounds, "user_id")
      // a convex combination of observed values cannot leave their range
      .filter(col("twa") < col("lo") - 1e-9 || col("twa") > col("hi") + 1e-9)
    assert(bad.isEmpty, "TWA left the convex hull of observed values")
  }
}
