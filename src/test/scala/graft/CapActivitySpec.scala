package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables.table
import graft.queries.{Dedup, Similarity, TextAnalysis}

/** The round-10 scale caps are verified by the hash gate in BOTH
  * regimes, and this spec pins that the gate actually exercises both:
  * at sf0.01 every block sits UNDER its cap (so those hashes prove the
  * capped query equals the uncapped semantics), while at sf0.1 at
  * least one block EXCEEDS it (so those hashes prove the Spark cap and
  * the oracle's QUALIFY mirror cut identically). If data regeneration
  * ever collapses one of the regimes, this fails before the gate can
  * silently stop covering it. Same structure for the SemDeDup adaptive
  * k: floor regime at sf0.01, adaptive at sf0.1.
  */
class CapActivitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def q61CellMax(dir: String): Long =
    table(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .groupBy(col("lang"), floor(col("n_chars") / 50))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)

  private def q52BrandMax(dir: String): Long =
    table(spark, dir, "part")
      .filter(col("p_partkey") % 13 === 0)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head.getLong(0)

  test("q61 cell cap: inert at sf0.01, active at sf0.1") {
    assert(q61CellMax("/root/testdata/sf0.01") <= TextAnalysis.Q61CellCap,
      "sf0.01 must stay under the cap so its hashes pin cap==uncapped")
    assert(q61CellMax("/root/testdata/sf0.1") > TextAnalysis.Q61CellCap,
      "sf0.1 must exceed the cap so its hashes pin the QUALIFY mirror")
  }

  test("q52 brand cap: inert at sf0.01, active at sf0.1") {
    assert(q52BrandMax("/root/testdata/sf0.01") <= Dedup.Q52BrandCap)
    assert(q52BrandMax("/root/testdata/sf0.1") > Dedup.Q52BrandCap)
  }

  test("SemDeDup adaptive k: floor regime at sf0.01, adaptive at sf0.1") {
    val n001 = table(spark, "/root/testdata/sf0.01", "embeddings").count()
    val n01 = table(spark, "/root/testdata/sf0.1", "embeddings").count()
    assert(Similarity.kForCorpus(n001) == 8, "sf0.01 must exercise the floor")
    assert(Similarity.kForCorpus(n01) > 8,
      "sf0.1 must exercise the adaptive regime (oracle kpar mirror)")
  }

  test("sign-LSH adaptive band bits: floor regime at both hash gates, " +
    "wider banding from the 10x rung up") {
    import graft.queries.Similarity2
    // the pure rule, against an independent bit-length model: clamp to
    // [8,16] of bitlen(n) - 4, so 2^bpb tracks n/16..n/32 and expected
    // random bucket collisions stay ~linear in n
    def model(n: Long): Int = {
      val bitlen = if (n == 0) 0 else java.lang.Long.toBinaryString(n).length
      math.min(16, math.max(8, bitlen - 4))
    }
    for (n <- Seq(0L, 1L, 499L, 500L, 2000L, 4095L, 4096L, 20000L,
        1000000L, Long.MaxValue)) {
      assert(Similarity2.bitsForCount(n) == model(n), s"n=$n")
    }
    // regime pinning (the kForCorpus structure): both DuckDB-gated SFs
    // sit on the FLOOR (hashes unchanged vs the fixed 4x8 banding, so
    // the gates keep certifying the banding itself), while the sf1
    // ScaleUp corpus (~20k vectors) flips engine AND oracle into the
    // wider banding — which the sf1 gate then hash-verifies
    val n001 = table(spark, "/root/testdata/sf0.01", "embeddings").count()
    val n01 = table(spark, "/root/testdata/sf0.1", "embeddings").count()
    assert(Similarity2.bitsForCount(n001) == 8, "sf0.01 must be floor")
    assert(Similarity2.bitsForCount(n01) == 8, "sf0.1 must be floor")
    assert(Similarity2.bitsForCount(n01 * 10) > 8,
      "the 10x rung must exercise the adaptive regime")
  }
}
