package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** q127 asymmetric containment: recompute every qualifying pair from a
  * first-principles Scala shingle-set model (tokenize, slide 5-grams,
  * md5-h60, df cap, set intersection) and check the direction logic —
  * the contained side is the one with the higher per-mille overlap.
  */
class ContainmentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("q127 equals a first-principles shingle-set containment model") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()

    val raw = docs.map { case (id, t) => id -> ShingleModel.shingleSet(t) }.toMap
    val dfCount = raw.values.flatten.groupBy(identity).view.mapValues(_.size)
    val hot = dfCount.filter(_._2 > Dedup.ContainMaxDf).keys.toSet
    val sets = raw.view.mapValues(_ -- hot).filter(_._2.nonEmpty).toMap

    val ids = sets.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      da = ids(i); db = ids(j)
      shared = (sets(da) & sets(db)).size.toLong
      if shared >= Dedup.MinContainShared
      na = sets(da).size.toLong; nb = sets(db).size.toLong
      ca = 1000L * shared / na; cb = 1000L * shared / nb
      if math.max(ca, cb) >= Dedup.MinContainPermille
    } yield
      if (ca > cb) (da, db, shared, na, nb, ca)
      else (db, da, shared, nb, na, cb))
      .toSeq
      .sortBy { case (dcd, dcr, _, _, _, cp) => (-cp, dcd, dcr) }

    val got = Dedup.q127(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected,
      s"engine ${got.take(3)} vs model ${expected.take(3)}")
    assert(got.nonEmpty, "sf0.001 corpus must contain containment pairs")
  }

  test("q127 direction: the reported permille is the contained side's, and maximal") {
    val rows = Dedup.q127(spark, sfDir).collect()
    rows.foreach { r =>
      val shared = r.getAs[Long]("n_shared")
      val cp = r.getAs[Long]("containment_permille")
      // the permille IS the contained side's overlap ratio...
      assert(1000L * shared / r.getAs[Long]("n_contained") == cp)
      // ...and the container side's ratio never exceeds it
      assert(1000L * shared / r.getAs[Long]("n_container") <= cp)
      assert(cp >= Dedup.MinContainPermille)
      assert(shared <= math.min(r.getAs[Long]("n_contained"),
        r.getAs[Long]("n_container")))
    }
  }
}
