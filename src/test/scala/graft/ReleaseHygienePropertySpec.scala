package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ReleaseOps => P8, ReleaseOps => P9}

/** Adversarial-corpus property tests for the release-hygiene family
  * (q113 snapshot diff, q115 incremental dedup, q117 drift histogram,
  * q118 content overlap). The driver corpus is benign — uniform ids,
  * unique texts; these corpora are not:
  *
  *  - `allDup`: every document has IDENTICAL text (the pathological
  *    corpus that melts naive dedup — fp sets collapse to one element)
  *  - `divisorSoup`: ids concentrated on multiples of 7/13/17 and their
  *    products, hitting every precedence interaction of the derived
  *    release (%13-delete shadows %7-edit; %17-new derives from deleted
  *    base docs too — by design, a release can re-add deleted content)
  *  - `tiny`: one document, one lang (degenerate group domains)
  *
  * Every expectation is recomputed INDEPENDENTLY in Scala from the raw
  * corpus via the same published derivation rules — the queries must
  * agree on corpora they were never tuned on. Plus the cross-query
  * invariant q113.unchanged == q115.dup_same_id (both are "same fp at
  * same id"), which must hold on EVERY corpus.
  */
class ReleaseHygienePropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Write a corpus as `<dir>/documents.parquet`, return the dir. */
  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("hygiene-corpus").toString
    rows.toDF("doc_id", "text", "lang")
      .withColumn("source", concat(lit("s"), col("doc_id") % 3))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Independent model of the derived release B: (doc_id, text). */
  private def modelB(rows: Seq[(Long, String, String)]): Seq[(Long, String)] =
    rows.filter(_._1 % 13 != 0)
      .map { case (id, t, _) => (id, if (id % 7 == 0) t + " v2" else t) } ++
      rows.filter(_._1 % 17 == 0)
        .map { case (id, t, _) => (-id - 1, "new:" + t) }

  private def statuses(rows: Seq[(Long, String, String)]): Map[String, Long] = {
    val a = rows.map { case (id, t, _) => id -> t }.toMap
    val b = modelB(rows).toMap
    val all = (a.keySet ++ b.keySet).toSeq
    all.map { id =>
      (a.get(id), b.get(id)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(x), Some(y)) => if (x == y) "unchanged" else "changed"
        case _ => sys.error("unreachable")
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def dedupStatuses(rows: Seq[(Long, String, String)]): Map[String, Long] = {
    val aById = rows.map { case (id, t, _) => id -> t }.toMap
    val aTexts = rows.map(_._2).toSet
    modelB(rows).map { case (id, t) =>
      if (aById.get(id).contains(t)) "dup_same_id"
      else if (aTexts.contains(t)) "dup_other_id"
      else "novel"
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  private def runFamily(rows: Seq[(Long, String, String)]): Unit = {
    val dir = corpus(rows)
    try {
      val q113 = P8.q113(spark, dir).collect()
        .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_docs")).toMap
      assert(q113 == statuses(rows).filter(_._2 > 0),
        s"q113 disagrees with the model on $dir")

      val q115 = P9.q115(spark, dir).collect()
        .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_docs")).toMap
      assert(q115 == dedupStatuses(rows).filter(_._2 > 0),
        s"q115 disagrees with the model")
      // cross-query invariant: same-fp-at-same-id is ONE predicate
      assert(q115.getOrElse("dup_same_id", 0L) == q113.getOrElse("unchanged", 0L),
        "q115.dup_same_id must equal q113.unchanged on every corpus")

      val q117 = P9.q117(spark, dir).collect()
      assert(q117.map(_.getAs[Long]("n_a")).sum == rows.length.toLong)
      assert(q117.map(_.getAs[Long]("n_b")).sum == modelB(rows).length.toLong)

      val q118 = P9.q118(spark, dir).collect()
        .map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_inter")))
        .toMap
      val byLang = rows.groupBy(_._3)
      val bTextByBase = modelB(rows).map { case (id, t) =>
        (if (id < 0) -id - 1 else id, t)
      }
      byLang.foreach { case (lang, rs) =>
        val langIds = rs.map(_._1).toSet
        val aFps = rs.map(_._2).toSet
        val bFps = bTextByBase.filter { case (base, _) => langIds(base) }
          .map(_._2).toSet
        val (na, nb, ni) = q118(lang)
        assert(na == aFps.size.toLong && nb == bFps.size.toLong &&
          ni == (aFps & bFps).size.toLong,
          s"q118 set counts disagree for lang $lang")
      }

      // q120 leakage: the duplicate-heavy corpora are exactly where
      // cross-split content collisions appear — model it from raw sets
      val q120 = P9.q120(spark, dir).collect()
        .map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("n_test"), r.getAs[Long]("n_leaked"))).toMap
      val splitOfId: Long => String = {
        val assigned = graft.Tables.table(spark, dir, "documents")
          .select(col("doc_id"), P9.splitOf(col("doc_id")).as("split"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assigned
      }
      val trainTexts = rows.filter(r => splitOfId(r._1) == "train")
        .map(_._2).toSet
      val testRows = rows.filter(r => splitOfId(r._1) == "test")
      val expected120 = testRows.groupBy(_._3).view.mapValues { rs =>
        (rs.length.toLong, rs.count(r => trainTexts(r._2)).toLong)
      }.toMap
      assert(q120 == expected120, "q120 disagrees with the raw-set model")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("all-duplicate corpus: one distinct text, every id colliding") {
    runFamily((0L until 200L).map(i => (i, "the same text every time", s"l${i % 2}")))
  }

  test("divisor-soup ids: 7/13/17 interactions incl. full products") {
    val ids = Seq(0L, 7L, 13L, 17L, 91L, 119L, 221L, 1547L,
      14L, 26L, 34L, 49L, 169L, 289L, 3094L, 4641L, 1L, 2L)
    runFamily(ids.map(i => (i, s"text body $i with words", s"l${i % 3}")))
  }

  test("tiny corpus: a single document") {
    runFamily(Seq((1L, "only doc", "solo")))
  }

  test("randomized corpora: 5 seeded draws with duplicate-heavy texts") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 50 + rnd.nextInt(150)
      val rows = (0 until n).map { _ =>
        val id = rnd.nextInt(5000).toLong
        // small text pool forces cross-id content collisions
        (id, s"pool text ${rnd.nextInt(20)}", s"l${rnd.nextInt(3)}")
      }.distinctBy(_._1)
      runFamily(rows)
    }
  }
}
