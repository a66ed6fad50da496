package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.ops.KMeans

/** End-to-end IVF with a TRAINED codebook: KMeans.fit learns the
  * centroids q24 stands in for, vectors are assigned by nearest
  * centroid, and cluster-pruned top-k search (nprobe=2) recovers most
  * of the brute-force cosine top-k — the recall/cost trade the 100 TB
  * ANN path is built on.
  */
class KMeansIvfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  private val K = 8
  private val TopK = 3
  private val NProbe = 2
  private val probeIds = Seq(10L, 11L, 12L, 13L, 14L)

  private def emb(): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  test("trained codebook + nprobe=2 search recovers brute-force top-3") {
    val e = emb()
    val fit = KMeans.fit(e, "vec_id", "embedding", K)
    assert(fit.centroids.length == K)

    import spark.implicits._
    val cents = fit.centroids.toSeq.toDF("cent_id", "cemb")
    // nearest-NProbe centroid ids per vector (rank over broadcast dists)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist"), col("cent_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        VectorOps.l2Sq(col("embedding"), col("cemb")).as("dist"))
      .withColumn("rn", row_number().over(wAssign))
    val clusters = assigned.filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cluster"))
    val probes = assigned.filter(col("rn") <= NProbe &&
        col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("cent_id").as("pcluster"))

    def topNeighbors(pairs: DataFrame): Map[Long, Seq[Long]] = {
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      pairs
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
        .select(col("probe_id"), col("neighbor_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    }

    // IVF: search only the probes' nprobe clusters
    val ivf = topNeighbors(probes
      .join(clusters, col("pcluster") === col("cluster") &&
        col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        VectorOps.cosineNative(col("pe"), col("embedding")).as("sim"))
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(max(col("sim")).as("sim"))) // a neighbor can match via 2 probes
    // brute force: search everything
    val exact = topNeighbors(e.as("p").filter(col("p.vec_id").isin(probeIds: _*))
      .crossJoin(e.as("c"))
      .filter(col("p.vec_id") =!= col("c.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("c.vec_id").as("neighbor_id"),
        VectorOps.cosineNative(col("p.embedding"), col("c.embedding")).as("sim")))

    val recalls = probeIds.map { p =>
      val hit = ivf.getOrElse(p, Nil).toSet
      val want = exact(p).toSet
      want.intersect(hit).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean too low: ${probeIds.zip(recalls)}")
  }
}
