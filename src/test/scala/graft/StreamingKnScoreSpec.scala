package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingKnScore

/** Streaming KN perplexity filter: per-batch per-doc scores against the
  * static train-split model must match an independently trained Scala
  * model bit-for-bit (same split hash, same piecewise rational, same
  * bit-length floor-log2), each doc scored exactly once, sub-2-token
  * docs out of domain, and the junk flag separating an ordinary
  * document from an all-OOV one.
  */
class StreamingKnScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  test("per-doc streaming scores match an independent KN model; " +
    "OOV junk flags, ordinary text passes, short docs out of domain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // independent model: train bigram counts over the train split
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(text: String): Seq[(String, String)] = {
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 2) Seq.empty else t.dropRight(1).zip(t.drop(1)).toSeq
    }
    val train = docs.filter(d => h60(s"split:${d._1}") % 1000 < 900)
    val bc = train.flatMap(d => bigrams(d._3))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val ctx = bc.groupBy(_._1._1).map { case (p, m) =>
      (p, (m.values.sum, m.size.toLong)) }
    val cont = bc.groupBy(_._1._2).map { case (c, m) => (c, m.size.toLong) }
    val nbt = bc.size.toLong
    def bitlen(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)
    def surp(p: String, c: String): Long = ctx.get(p) match {
      case None => bitlen(4 * nbt) - 1
      case Some((ccnt, n1p)) =>
        val bcc = bc.getOrElse((p, c), 0L)
        val num = nbt * (if (bcc == 0) 0L else 4 * bcc - 3) +
          3 * n1p * cont.getOrElse(c, 0L)
        if (num <= 0) bitlen(4 * nbt) - 1
        else bitlen(4 * ccnt * nbt / num) - 1
    }
    def docScore(text: String): (Long, Long, Long) = {
      val ss = bigrams(text).map { case (p, c) => surp(p, c) }
      (ss.length.toLong, ss.sum, 1000 * ss.sum / ss.length)
    }

    val normal = docs.head // an ordinary corpus document
    val junkText = "zzq wvx qqj zzq wvx qqj zzq wvx qqj zzq"
    val shortText = "lonely"
    val (nN, sN, pN) = docScore(normal._3)
    val (nJ, sJ, pJ) = docScore(junkText)
    assert(pN <= StreamingKnScore.JunkPermille,
      s"ordinary doc scored $pN — fixture assumption broken")
    assert(pJ > StreamingKnScore.JunkPermille,
      s"OOV doc scored $pJ — fixture assumption broken")

    val model = StreamingKnScore.modelOf(spark, sfDir)
    val input = MemoryStream[(Long, String, String)]
    val got = mutable.Map[Long, (Long, Long, Long, Boolean)]()
    val stream = StreamingKnScore.start(
      input.toDF().toDF("doc_id", "lang", "text"), model) {
      (scores, _) =>
        scores.collect().foreach { r =>
          val id = r.getLong(0)
          assert(!got.contains(id), s"doc $id scored twice")
          got(id) = (r.getLong(2), r.getLong(3), r.getLong(4),
            r.getBoolean(5))
        }
    }
    try {
      input.addData((900001L, normal._2, normal._3),
        (900002L, "en", shortText))
      stream.processAllAvailable()
      assert(got.keySet == Set(900001L), s"batch 1 verdicts: $got")
      input.addData((900003L, "en", junkText))
      stream.processAllAvailable()
      assert(got.keySet == Set(900001L, 900003L))
      assert(got(900001L) == ((nN, sN, pN, false)))
      assert(got(900003L) == ((nJ, sJ, pJ, true)))
    } finally stream.stop()
  }
}
