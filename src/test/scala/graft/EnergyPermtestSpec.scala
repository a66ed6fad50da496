package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MonitoringOps

/** First-principles re-derivation of q259's permutation energy test —
  * the full pipeline (quantize, isqrt distances, h60 rank splits,
  * milli-quantized statistic, add-one p) recomputed in independent
  * Scala at sf0.001, plus the REJECTION mechanism pinned on a crafted
  * corpus where class 1 is a genuinely shifted distribution: label01
  * must reject, parity (which mixes both classes) must not.
  */
class EnergyPermtestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  /** The whole test recomputed from raw (vec_id, label, embedding). */
  private def model(rows: Seq[(Long, Long, Array[Float])])
      : Seq[(String, Long, Long, Long, Long, Long, Boolean)] = {
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000d).toLong)
    def dist(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.floor(math.sqrt(s.toDouble)).toLong
    }
    val panel = rows.filter(r => r._3.length == 64 && r._1 < 400)
    val cmps = Seq(
      ("parity", panel.filter(r => r._1 % 4 == 1 || r._1 % 4 == 2)
        .map(r => (r._1, if (r._1 % 4 == 1) "A" else "B", quant(r._3)))),
      ("label01", panel.filter(r => r._2 == 0 || r._2 == 1)
        .map(r => (r._1, if (r._2 == 0) "A" else "B", quant(r._3)))))
    cmps.map { case (cmp, ms) =>
      val ids = ms.map(_._1)
      val grp = ms.map(m => (m._1, m._2)).toMap
      val qv = ms.map(m => (m._1, m._3)).toMap
      val na = ms.count(_._2 == "A").toLong
      val nb = ms.count(_._2 == "B").toLong
      val pairs = for {
        a <- ids; b <- ids if a < b
      } yield (a, b, dist(qv(a), qv(b)))
      def eOf(g: Long => String): Long = {
        var sab = 0L; var saa = 0L; var sbb = 0L
        pairs.foreach { case (a, b, d) =>
          (g(a), g(b)) match {
            case (x, y) if x != y => sab += d
            case ("A", "A") => saa += d
            case _ => sbb += d
          }
        }
        2000 * sab / (na * nb) - 2000 * saa / (na * (na - 1)) -
          2000 * sbb / (nb * (nb - 1))
      }
      val eObs = eOf(grp)
      val nGe = (1 to MonitoringOps.EdPerms).count { p =>
        val ranked = ids.sortBy(id => (h60(s"ed:$cmp:$p:$id"), id))
        val aSet = ranked.take(na.toInt).toSet
        eOf(id => if (aSet.contains(id)) "A" else "B") >= eObs
      }.toLong
      val pPm = 1000 * (1 + nGe) / (1 + MonitoringOps.EdPerms)
      (cmp, na, nb, eObs, nGe, pPm,
        pPm <= MonitoringOps.EdAlphaPermille)
    }.sortBy(_._1)
  }

  test("q259: the full permutation test matches an independent model " +
    "at sf0.001") {
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray)).toSeq
    val expect = model(rows)
    val got = MonitoringOps.q259(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got == expect)
  }

  test("q259: a genuinely shifted class REJECTS while the mixed parity " +
    "split does not (crafted corpus)") {
    import spark.implicits._
    // deterministic pseudo-noise + a +0.08 shift on every dim of class 1
    def vec(id: Long, shift: Float): Array[Float] =
      Array.tabulate(64) { d =>
        ((h60(s"edfix:$id:$d") % 2000L) - 1000L) / 10000.0f + shift
      }
    val rows: Seq[(Long, Long, Array[Float])] = (0L until 120L).map { id =>
      val label = if (id < 60) 0L else 1L
      (id, label, vec(id, if (label == 1L) 0.08f else 0.0f))
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_q259_fixture").toString
    rows.toDF("vec_id", "label", "embedding")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val byCmp = MonitoringOps.q259(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(5), r.getBoolean(6)))).toMap
    assert(byCmp("label01")._2,
      s"shifted class not rejected: p=${byCmp("label01")._1}")
    assert(!byCmp("parity")._2,
      s"null parity split rejected: p=${byCmp("parity")._1}")
    // the crafted rows must also match the independent model end-to-end
    val expect = model(rows)
    val full = MonitoringOps.q259(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(full == expect)
  }
}
