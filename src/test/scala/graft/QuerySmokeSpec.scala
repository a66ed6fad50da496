package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Executes every registered query at sf0.001 — catches analysis errors,
  * type mismatches, and empty results early. The full value-level oracle
  * compare runs via Verify + tools/check.py at sf0.01.
  */
class QuerySmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query id has an oracle or is explicitly oracle-free") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this list intentional: only engine-specific sketches/codecs
    assert(noOracle == Set("q38_approx_sketches", "q48_image_features",
      "q69_audio_features"),
      s"unexpected oracle-free queries: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
