package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Relational15, SetSimJoin, Shingles}

/** q173 (exact set-similarity join) / q174 (skyline): the filter-
  * exactness claims the oracle gate proves only on corpus-present
  * boundaries — a planted pair at EXACTLY τ (must be kept), one just
  * below (must vanish), equality against the unfiltered brute force,
  * and a hand-built dominance lattice with ties on both axes.
  */
class SetSimJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.01"

  // ---------------------------------------------------------------- q173

  test("q173: equals the unfiltered brute-force join on the real corpus") {
    val docs = graft.Tables.table(spark, sfDir, "documents")
    val grams = Shingles.hashesWithDf(docs).select(col("doc_id"), col("h"))
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val brute = grams.as("a")
      .join(grams.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("sa.n") + col("sb.n") - col("inter")).as("union_size"))
      .withColumn("jp", expr("1000 * inter DIV union_size"))
      .filter(col("jp") >= SetSimJoin.Tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pp = SetSimJoin.q173(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pp == brute,
      s"prefix filtering must lose nothing: missing=${brute -- pp} extra=${pp -- brute}")
    assert(pp.nonEmpty, "corpus must contain near-dup pairs or the test is vacuous")
  }

  test("q173: a pair at exactly τ survives; one permille below vanishes") {
    val dir = Files.createTempDirectory("graft_ppjoin").toFile.getAbsolutePath
    import spark.implicits._
    val shared16 = (1 to 16).map(i => s"s$i").mkString(" ")
    val shared15 = (1 to 15).map(i => s"s$i").mkString(" ")
    // doc 0/1: 6 unique + 16 shared tokens -> 18 shingles each, 12
    // shared -> J = 12/24 = exactly 0.5. doc 2: 7 unique + 15 shared
    // -> inter 11, union 25 with either -> 440 permille, below τ.
    val d0 = (1 to 6).map(i => s"u$i").mkString(" ") + " " + shared16
    val d1 = (1 to 6).map(i => s"v$i").mkString(" ") + " " + shared16
    val d2 = (1 to 7).map(i => s"w$i").mkString(" ") + " " + shared15
    Seq((0L, d0), (1L, d1), (2L, d2))
      .map { case (i, t) => (i, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SetSimJoin.q173(spark, dir).collect()
    assert(rows.length == 1, s"only the τ-exact pair: ${rows.mkString(";")}")
    val r = rows.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((0L, 1L, 12L, 24L, 500L)))
  }

  // ---------------------------------------------------------------- q174

  test("q174: dominance lattice with ties on both axes") {
    val dir = Files.createTempDirectory("graft_skyline").toFile.getAbsolutePath
    import spark.implicits._
    // skyline: A(5.0,10), B+C tie (7.0,12), G(9.0,15)
    // dominated: D(7.0,11) by B; E(6.0,9) by A; F(8.0,12) by B
    Seq((1L, 5.0, 10), (2L, 7.0, 12), (3L, 7.0, 12), (4L, 7.0, 11),
      (5L, 6.0, 9), (6L, 8.0, 12), (7L, 9.0, 15))
      .map { case (k, p, s) => (k, s"part$k", "b", "t", s, p) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val keys = Relational15.q174(spark, dir).collect().map(_.getLong(0)).toSet
    assert(keys == Set(1L, 2L, 3L, 7L),
      s"exact ties must BOTH survive, dominated rows must not: $keys")
  }

  test("q174: no returned row is dominated, every excluded row is") {
    val all = graft.Tables.table(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val sky = Relational15.q174(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    def dominated(a: (Long, Double, Int)) = all.exists { b =>
      b._1 != a._1 && b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3)
    }
    all.foreach { p =>
      assert(sky.contains(p._1) == !dominated(p),
        s"membership must equal non-dominance for $p")
    }
  }
}
