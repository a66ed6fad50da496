package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Distributed Lloyd's k-means over an embedding column — the in-engine
  * trainer for the IVF codebook that q24's ANN search consumes (q24
  * uses a stand-in codebook; this is how a real one is fit at 100 TB).
  *
  * Scale shape per iteration:
  *   - assignment: vectors × broadcast(centroids) (k rows — always
  *     broadcastable), nearest centroid via `min(struct(dist, id))`
  *     partial+final aggregation — NO window, no shuffle of the vector
  *     column beyond the one groupBy(id) exchange;
  *   - update: posexplode to (cluster, dim, value) and a two-level avg —
  *     after map-side combine the shuffle carries at most
  *     k × dim × partitions partial sums, independent of row count;
  *   - the k × dim codebook (a few KB) is the ONLY thing that ever
  *     reaches the driver, exactly like the CC loop's one-row checksum.
  *
  * Deterministic end to end: init = the k lowest-id vectors, distance
  * ties break toward the lower centroid id, and the per-dimension avg
  * is the same float regardless of row order only up to FP association
  * — so the trainer is spec-gated (invariants + blob recovery), not
  * oracle-gated; the CONSUMER (q24) stays under the cross-engine gate
  * with a fixed codebook.
  */
object KMeans {

  final case class Result(
      assignments: DataFrame, // (id, cluster, dist)
      centroids: Array[(Int, Array[Float])],
      iterations: Int,
      wcss: Seq[Double]) // within-cluster sum of squares per iteration

  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIters: Int = 20,
      tol: Double = 1e-8): Result = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val data = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .localCheckpoint() // fix the input; the loop re-reads it every round

    def centDf(cents: Array[(Int, Array[Float])]): DataFrame = {
      import spark.implicits._
      cents.toSeq.toDF("cent_id", "cemb")
    }

    def assign(cents: Array[(Int, Array[Float])]): DataFrame =
      data.crossJoin(broadcast(centDf(cents)))
        .select(col("id"), col("vec"),
          struct(VectorOps.l2Sq(col("vec"), col("cemb")).as("dist"),
            col("cent_id").as("cent_id")).as("dc"))
        .groupBy(col("id"), col("vec"))
        .agg(min(col("dc")).as("best"))
        .select(col("id"), col("vec"),
          col("best.cent_id").as("cluster"), col("best.dist").as("dist"))

    var cents: Array[(Int, Array[Float])] = data
      .orderBy(col("id")).limit(k).collect()
      .zipWithIndex
      .map { case (r: Row, i) => (i, r.getSeq[Float](1).toArray) }
    require(cents.length == k, s"need >= $k rows to seed $k centroids")
    val dim = cents.head._2.length
    var iters = 0
    var shift = Double.MaxValue
    val wcss = Seq.newBuilder[Double]
    while (iters < maxIters && shift > tol) {
      val assigned = assign(cents)
      val upd = assigned
        .select(col("cluster"), col("dist"),
          posexplode(col("vec")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("v")).as("m"),
          // dist is constant per (id); dividing the per-dim sum by dim
          // recovers the plain per-row sum for the WCSS telemetry
          (sum(col("dist")) / dim).as("w"))
        .collect()
      wcss += upd.iterator.map(_.getDouble(3)).sum
      val next = upd.groupBy(_.getInt(0)).map { case (c, rows) =>
        val v = new Array[Float](dim)
        rows.foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
        (c, v)
      }.toArray.sortBy(_._1)
      // an emptied cluster keeps its previous centroid (deterministic)
      val merged = cents.map { case (c, old) =>
        (c, next.collectFirst { case (`c`, v) => v }.getOrElse(old))
      }
      shift = cents.zip(merged).iterator.map { case ((_, a), (_, b)) =>
        a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
      }.max
      cents = merged
      iters += 1
    }
    Result(assign(cents), cents, iters, wcss.result())
  }
}
