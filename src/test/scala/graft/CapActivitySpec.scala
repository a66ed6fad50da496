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
}
