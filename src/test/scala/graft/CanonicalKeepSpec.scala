package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** q156 (quality-priority canonical keep) and q157 (cluster-size
  * profile): the policy fixture a clean corpus cannot provide — a
  * cluster whose BEST-quality member is not its smallest id, proving
  * the keep decision really ranks on quality — plus the corpus-level
  * invariants tying both queries to q87's clustering.
  */
class CanonicalKeepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  /** A 2-doc near-dup cluster where the HIGHER id is the cleaner doc:
    * doc 5 is doc 9's text plus a stopword/punctuation tail (lower
    * alpha ratio, higher stop ratio ⇒ strictly lower q_u3), and the
    * shared 60-token prefix keeps their shingle Jaccard high enough to
    * collide in the banding. A min-id policy (q87's) would keep 5; the
    * quality policy must keep 9 and drop 5.
    */
  test("q156 keeps the best-quality member, not the smallest id") {
    // 120-token base, 6-token dirty tail ⇒ shingle Jaccard ≈ 0.95, which
    // this banding (4 bands × 4 rows) collides on for these exact hash
    // values (empirically pinned — a 20-token tail at J ≈ 0.74 did not)
    val base = (1 to 120).map(i => s"tok${i % 23}w${i % 7}").mkString(" ")
    val dirtyTail = " the the of and a ."
    val dir = Files.createTempDirectory("graft_keep").toFile.getAbsolutePath
    import spark.implicits._
    Seq(
      (5L, base + dirtyTail, "en", "srcDirty", (base + dirtyTail).length.toLong),
      (9L, base, "en", "srcClean", base.length.toLong),
      // an unrelated singleton so the corpus has an untouched source
      (11L, (1 to 40).map(i => s"zq${i}x${i % 5}").mkString(" "), "en",
        "srcSolo", 400L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = Dedup.q156(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the pair must actually have clustered, else the fixture is dead
    assert(rows("srcDirty") == (1L, 1L),
      s"doc 5 (dirty, smaller id) must be dropped: $rows")
    assert(rows("srcClean") == (1L, 0L),
      s"doc 9 (clean, larger id) must be kept: $rows")
    assert(rows("srcSolo") == (1L, 0L), s"singleton must be kept: $rows")
  }

  test("q156/q87 drop the same NUMBER of docs — policy changes who, " +
    "never how many") {
    val q156Dropped = Dedup.q156(spark, sfDir).collect()
      .map(_.getLong(2)).sum
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val q87Kept = Dedup.q87(spark, sfDir).collect().map(_.getLong(1)).sum
    assert(q156Dropped == total - q87Kept,
      s"per-cluster drops must be |cluster|-1 under any keep policy")
    assert(q156Dropped > 0, "fixture corpus must contain near-dup clusters")
  }

  test("q157 histogram masses add back to the corpus") {
    val hist = Dedup.q157(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(hist.map { case (sz, n) => sz * n }.sum == total,
      s"sum(size·count) must equal the doc count: ${hist.toSeq}")
    // labeled clusters have >= 2 members; the size-1 row is the
    // singleton count and must be the only size-1 mass
    assert(hist.count(_._1 == 1L) == 1)
    assert(hist.filter(_._1 >= 2).map(_._2).sum > 0,
      "corpus must contain at least one real cluster")
  }
}
