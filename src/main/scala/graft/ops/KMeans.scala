package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Distributed Lloyd's k-means over an embedding column — the in-engine
  * trainer for the IVF codebook that q24's ANN search consumes (q24
  * uses a stand-in codebook; this is how a real one is fit at 100 TB).
  *
  * Scale shape per iteration:
  *   - assignment: vectors × broadcast(centroids) (k rows — always
  *     broadcastable), nearest centroid via `min(struct(dist, id))`
  *     partial+final aggregation — NO window, and the min-struct
  *     carries ONLY (dist, cent_id): the vector column never rides the
  *     n·k candidate stream (the dim-multiplied agg payload measured
  *     at ~110 GB / 745 s on the sf10 rung before this rule), it is
  *     joined back from the checkpointed input as an n-row join;
  *   - update: posexplode to (cluster, dim, value) and a two-level avg —
  *     after map-side combine the shuffle carries at most
  *     k × dim × partitions partial sums, independent of row count;
  *   - the k × dim codebook (a few KB) is the ONLY thing that ever
  *     reaches the driver, exactly like the CC loop's one-row checksum.
  *     (For corpus-proportional k use [[fitTwoLevel]] — flat Lloyd
  *     against an adaptive k = n/c codebook is n²/c per round.)
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

    // The min-struct carries ONLY (dist, cent_id) — riding the vector
    // through the n·k-row aggregation multiplies the agg/shuffle payload
    // by dim (the exact defect fitQuantized's sf10 rung measured at
    // 745 s). The vector is joined back from the checkpointed `data`
    // afterwards: an n-row join, not an n·k payload.
    def assign(cents: Array[(Int, Array[Float])]): DataFrame =
      data.crossJoin(broadcast(centDf(cents)))
        .select(col("id"),
          struct(VectorOps.l2Sq(col("vec"), col("cemb")).as("dist"),
            col("cent_id").as("cent_id")).as("dc"))
        .groupBy(col("id"))
        .agg(min(col("dc")).as("best"))
        .join(data, Seq("id"))
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

  final case class QResult(
      assignments: DataFrame, // (id, cluster)
      centroids: Array[(Int, Array[Long])],
      scale: Long)

  /** Lloyd's k-means in EXACT int64 arithmetic — the bit-reproducible
    * trainer (q94's path under the cross-engine hash gate, and the right
    * call at 100 TB where a rerun must produce the same codebook
    * regardless of partitioning or row order):
    *
    *   - vectors are quantized once: `floor(x · scale)` per element;
    *   - assignment distance is integer squared L2 (`Σ (xq − cq)²` over
    *     int64 — exact, order-independent), ties break toward the lower
    *     centroid id;
    *   - the update is `floor(sum / count)` per dimension, computed as a
    *     double divide + floor: sums stay ≤ ~2⁵³ by the quantization
    *     budget, and the quotient is a rational with denominator = the
    *     cluster size, far (≥ 1/n) from any half-ulp boundary — so the
    *     floor is deterministic on every IEEE-754 engine;
    *   - exactly `iters` update rounds run (no convergence epsilon — a
    *     float threshold would reintroduce order sensitivity), then one
    *     final assignment against the settled codebook;
    *   - an emptied cluster keeps its previous centroid.
    *
    * Same distributed shape as [[fit]]: broadcast k-row codebook,
    * min-struct partial+final aggregation, posexplode update whose
    * shuffle carries ≤ k × dim × partitions partial sums; only the
    * k × dim codebook reaches the driver each round.
    *
    * Seeding = the k lowest-id vectors (cent_id 0..k−1 in ascending id
    * order), the same deterministic init as [[fit]].
    */
  def fitQuantized(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scale: Long = 10000L): QResult = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = df.sparkSession
    val data = df.select(col(idCol).as("id"),
        expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * ${scale}D) AS BIGINT))")
          .as("xq"))
      .localCheckpoint()

    def centDf(cents: Array[(Int, Array[Long])]): DataFrame = {
      import spark.implicits._
      cents.toSeq.toDF("cent_id", "cq")
    }

    def intDist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)

    // The min-struct carries ONLY (dist, cent_id): the vector array never
    // participates in the comparison, and riding it through the n·k-row
    // aggregation multiplies the agg/shuffle payload by dim (measured at
    // the sf10 rung: 64-long payloads × 200M candidate rows ≈ 110 GB
    // through the hash agg — the build took 745 s). Consumers that need
    // xq (the update pass) join it back from the checkpointed `data` —
    // an n-row join, not an n·k payload.
    def assign(cents: Array[(Int, Array[Long])]): DataFrame =
      data.crossJoin(broadcast(centDf(cents)))
        .select(col("id"),
          struct(intDist(col("xq"), col("cq")).as("dist"),
            col("cent_id").as("cent_id")).as("dc"))
        .groupBy(col("id"))
        .agg(min(col("dc")).as("best"))
        .select(col("id"), col("best.cent_id").as("cluster"))

    var cents: Array[(Int, Array[Long])] = data
      .orderBy(col("id")).limit(k).collect()
      .zipWithIndex
      .map { case (r: Row, i) => (i, r.getSeq[Long](1).toArray) }
    require(cents.length == k, s"need >= $k rows to seed $k centroids")
    val dim = cents.head._2.length
    var round = 0
    while (round < iters) {
      // max(abs(v)) rides the same shuffle as the sum: n·maxAbs bounds
      // |Σv|, so the driver-side guard below proves — per (cluster, dim),
      // per round — that the int64 sum cannot have wrapped (bound < 2⁶³)
      // AND that the double divide is exact (bound < 2⁵³). Breaching the
      // quantization budget fails loudly instead of silently training a
      // non-reproducible codebook (the Spark long sum wraps without
      // error in non-ANSI mode; the DuckDB oracle sums in HUGEINT).
      val upd = assign(cents)
        .join(data, Seq("id")) // xq back for the update — n rows, not n·k
        .select(col("cluster"), posexplode(col("xq")).as(Seq("dim", "v")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
          max(abs(col("v"))).as("ma"))
        .collect()
      val next = upd.groupBy(_.getInt(0)).map { case (c, rows) =>
        val v = new Array[Long](dim)
        rows.foreach { r =>
          val (s, n, ma) = (r.getLong(2), r.getLong(3), r.getLong(4))
          require(BigInt(n) * BigInt(ma) < (BigInt(1) << 53),
            s"fitQuantized budget breached: cluster ${r.getInt(0)} dim " +
              s"${r.getInt(1)} has n=$n max|xq|=$ma — n·max|xq| must stay " +
              s"< 2^53 for the int64 sum and exact floor; lower `scale` " +
              s"or pre-aggregate")
          v(r.getInt(1)) = math.floor(s.toDouble / n).toLong
        }
        (c, v)
      }
      cents = cents.map { case (c, old) => (c, next.getOrElse(c, old)) }
      round += 1
    }
    QResult(assign(cents), cents, scale)
  }
}
