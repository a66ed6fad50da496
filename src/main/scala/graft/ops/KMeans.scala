package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
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
    val data = quantized(df, idCol, vecCol, scale).localCheckpoint()
    val (asg, cents) = lloydQuantized(data, k, iters)
    QResult(asg, cents, scale)
  }

  /** floor(x·scale) int64 quantization to the trainer's (id, xq) frame —
    * the single spelling both [[fitQuantized]] and [[fitTwoLevel]] (and
    * their oracle `eq` CTEs) derive from.
    */
  private def quantized(
      df: DataFrame, idCol: String, vecCol: String, scale: Long): DataFrame =
    df.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * ${scale}D) AS BIGINT))")
        .as("xq"))

  /** Flat exact-int64 Lloyd over a pre-quantized, checkpointed
    * (id, xq) frame: the [[fitQuantized]] core, reused verbatim as
    * [[fitTwoLevel]]'s COARSE stage (where k is √K — the k×dim driver
    * codebook here is the √K-row bounded class, never corpus-
    * proportional). Returns (final assignments (id, cluster), settled
    * integer codebook).
    */
  private def lloydQuantized(
      data: DataFrame,
      k: Int,
      iters: Int): (DataFrame, Array[(Int, Array[Long])]) = {
    val spark = data.sparkSession

    def centDf(cents: Array[(Int, Array[Long])]): DataFrame = {
      import spark.implicits._
      cents.toSeq.toDF("cent_id", "cq")
    }

    def intDist(a: Column, b: Column): Column = VectorOps.intSqDist(a, b)

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
    (assign(cents), cents)
  }

  final case class TLResult(
      assignments: DataFrame, // (id, cluster: bigint) — contiguous 0..K-1
      centroids: DataFrame, // (cent_id: bigint, cq: array<bigint>) — settled
      kCoarse: Int,
      scale: Long)

  /** TWO-LEVEL exact-int64 k-means — the corpus-proportional-k trainer
    * (k = n/c grows with the corpus, the IVF/SemDeDup sizing rule). A
    * flat Lloyd at adaptive k is n·k = n²/c distance evaluations per
    * round (measured 744.8 s for the q170 index build at the sf10 rung)
    * and collects a k×dim codebook to the driver — both quadratic /
    * corpus-proportional. This trainer is the n·√k shape:
    *
    *   1. COARSE: [[lloydQuantized]] at kc = ⌈√k⌉ cells (n·√k per round;
    *      the only driver-resident codebook is √k×dim — bounded);
    *   2. ALLOCATE: each non-empty cell gets ≥1 fine centroids, the
    *      remaining k − #cells seats by Hamilton largest-remainder on
    *      cell sizes (ties → lower cell id), capped at the cell size —
    *      all-integer arithmetic, so the oracle reproduces the exact
    *      seat table; Σ kf = k whenever no cap binds;
    *   3. FINE: per-cell Lloyd — seeds are the kf lowest ids of each
    *      cell; each round assigns only against the OWN cell's fine
    *      centroids (Σ n_c·kf_c ≈ n·√k per round, never n·k), ties →
    *      lower fine id; update is floor(sum/count) per (cell, fine,
    *      dim) with the in-plan 2⁵³ budget guard (raise_error — loud,
    *      executor-side, nothing collected); emptied fine centroids
    *      keep their previous coordinates. The fine codebook lives in a
    *      DISTRIBUTED k-row frame the whole way — localCheckpoint per
    *      round, never `.collect()` (at 10⁹ vectors k×dim is ~2.5 GB:
    *      over driver/broadcast limits by design).
    *   4. LABEL: cluster = cell_offset + fine, offsets = running Σ kf
    *      over cells by id — contiguous global ids, no gaps when no cap
    *      binds.
    *
    * The fine-assignment join (cell → cell centroids) is SALTED
    * [[FineSalts]] ways: coarse cells are value-skewed by nature, and an
    * unsalted join puts an entire cell — n/√k rows × its whole fine
    * block — in one task; the salt respreads each cell across
    * [[FineSalts]] tasks at the cost of replicating the k-row codebook
    * frame ×[[FineSalts]] (trivial). Assignment output never carries a
    * vector: min-struct is (dist, fine) only, xq joins back n-row for
    * the update (the round-12 payload rule).
    *
    * Deterministic end to end by the same contract as [[fitQuantized]]
    * (which it reuses for the coarse stage): floor quantization, integer
    * distances, id-ranked seeding, fixed round counts, floor(sum/count)
    * updates — bit-reproducible under any partitioning, so the trained
    * assignment sits under the cross-engine hash gate (the oracle
    * unrolls both stages as CTEs — `Similarity.kmAssignCtes`).
    */
  def fitTwoLevel(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      coarseIters: Int,
      fineIters: Int,
      scale: Long = 10000L): TLResult = {
    require(k >= 1, s"k must be >= 1, got $k")
    val kc = ceilSqrt(k)
    val data = quantized(df, idCol, vecCol, scale).localCheckpoint()
    val (coarseAsg, _) = lloydQuantized(data, kc, coarseIters)

    // (id, xq, cell) — the fine loop's fixed input, one corpus copy
    val dataC = data
      .join(coarseAsg.select(col("id"), col("cluster").as("cell")), Seq("id"))
      .localCheckpoint()

    // Hamilton largest-remainder seat table over the ≤kc non-empty cells
    // (a √k-row frame: the global windows below each sort ≤√k rows).
    // Base 1 seat per cell keeps every vector assignable; LEAST(nc, ·)
    // caps a seat count at the cell population (a cell can't seed more
    // centroids than it has members — binds only on degenerate corpora).
    val wRem = Window.orderBy(col("md").desc, col("cell"))
    val wOff = Window.orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val csz = dataC.groupBy(col("cell")).agg(count(lit(1)).as("nc"))
    val tots = csz.agg(sum(col("nc")).as("n"), count(lit(1)).as("ncells"))
    val alloc = csz.crossJoin(broadcast(tots))
      .withColumn("rem", lit(k.toLong) - col("ncells"))
      .withColumn("fl", expr("rem * nc div n"))
      .withColumn("md", expr("(rem * nc) % n"))
    val sumfl = alloc.agg(sum(col("fl")).as("sumfl"))
    val offs = alloc.crossJoin(broadcast(sumfl))
      .withColumn("rr", row_number().over(wRem))
      .select(col("cell"), col("nc"),
        least(col("nc"),
          lit(1L) + col("fl") +
            when(col("rr") <= col("rem") - col("sumfl"), 1L).otherwise(0L))
          .as("kf"))
      .withColumn("off", coalesce(sum(col("kf")).over(wOff), lit(0L)))
      .localCheckpoint() // √k rows

    // fine seeds: the kf lowest ids of each cell (rank on a NARROW
    // (id, cell) projection; xq joins back seed-row-count deep).
    // SKEW BOUND: this window shuffles the (id, cell) pairs on cell, so
    // ONE reducer task sorts each cell — n/√k rows expected, and a hot
    // coarse cell degrades to a single-task sort of its population
    // (worst case n, if the coarse stage collapses every vector into
    // one cell — see the dominant-cell KMeansSpec case). The pass ranks
    // 16-byte pairs, not vectors, so even the degenerate task is a sort,
    // not a distance pass; at the measured rungs (200k×64d, sf10) the
    // seed pass is noise next to the n·√k assignment rounds. If a
    // future rung shows a hot cell here, the salted refinement is:
    // rank within (cell, pmod(id, S)) stripes first, keep rk ≤ kf per
    // stripe (the cell's kf lowest ids are contained in the union of
    // its stripes' kf lowest), then run this window over the surviving
    // ≤ S·kf rows per cell — same output, straggler bounded by S·kf.
    val wSeed = Window.partitionBy(col("cell")).orderBy(col("id"))
    val fcb0 = dataC.select(col("id"), col("cell"))
      .withColumn("rk", row_number().over(wSeed))
      .join(broadcast(offs.select(col("cell"), col("kf"))), Seq("cell"))
      .filter(col("rk") <= col("kf"))
      .join(dataC.select(col("id"), col("xq")), Seq("id"))
      .select(col("cell"), (col("rk") - 1).cast("int").as("fine"),
        col("xq").as("cq"))

    def assignFine(fcb: DataFrame): DataFrame =
      dataC
        .withColumn("salt", pmod(col("id").cast("long"), lit(FineSalts.toLong))
          .cast("int"))
        .join(fcb.select(col("cell"), col("fine"), col("cq"),
          explode(expr(s"sequence(0, ${FineSalts - 1})")).as("salt")),
          Seq("cell", "salt"))
        .select(col("id"), col("cell"),
          struct(VectorOps.intSqDist(col("xq"), col("cq")).as("dist"),
            col("fine")).as("dc"))
        .groupBy(col("id"), col("cell"))
        .agg(min(col("dc")).as("best"))
        .select(col("id"), col("cell"), col("best.fine").as("fine"))

    var fcb = fcb0.localCheckpoint()
    var round = 0
    while (round < fineIters) {
      // same 2^53 budget as fitQuantized (n·max|xq| bounds |Σxq|, proves
      // no int64 wrap AND an exact double floor) — enforced in-plan: the
      // k-proportional update frame never reaches the driver, so the
      // check can't either. The double product understates by ≤1 ulp;
      // comparing against 9.0e15 (< 2^53 ≈ 9.007e15) keeps it sound.
      val upd = assignFine(fcb)
        .join(dataC.select(col("id"), col("xq")), Seq("id"))
        .select(col("cell"), col("fine"),
          posexplode(col("xq")).as(Seq("d", "v")))
        .groupBy(col("cell"), col("fine"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"),
          max(abs(col("v"))).as("ma"))
        .select(col("cell"), col("fine"), col("d"),
          when(col("cnt").cast("double") * col("ma").cast("double") < 9.0e15,
            floor(col("s").cast("double") / col("cnt")).cast("long"))
            .otherwise(raise_error(concat(
              lit("fitTwoLevel budget breached: cell "), col("cell"),
              lit(" fine "), col("fine"), lit(" dim "), col("d"),
              lit(" has n="), col("cnt"), lit(" max|xq|="), col("ma"),
              lit(" — n·max|xq| must stay < 2^53; lower `scale` or " +
                "pre-aggregate")))).as("x"))
      val updArr = upd.groupBy(col("cell"), col("fine"))
        .agg(expr("transform(array_sort(collect_list(struct(d, x))), s -> s.x)")
          .as("nq"))
      fcb = fcb.join(updArr, Seq("cell", "fine"), "left")
        .select(col("cell"), col("fine"),
          coalesce(col("nq"), col("cq")).as("cq"))
        .localCheckpoint() // k rows — lineage cut, never collected
      round += 1
    }

    val offSel = broadcast(offs.select(col("cell"), col("off")))
    TLResult(
      assignFine(fcb).join(offSel, Seq("cell"))
        .select(col("id"), (col("off") + col("fine")).as("cluster")),
      fcb.join(offSel, Seq("cell"))
        .select((col("off") + col("fine")).as("cent_id"), col("cq")),
      kc, scale)
  }

  /** Salt fan-out of the fine-assignment join (see [[fitTwoLevel]]). */
  private[graft] val FineSalts = 16

  /** ⌈√k⌉ by exact integer adjustment (the float sqrt is only a seed —
    * the result is proven by multiplication, any k).
    */
  private[graft] def ceilSqrt(k: Long): Int = {
    require(k >= 1)
    var r = math.max(1L, math.sqrt(k.toDouble).toLong)
    while (r * r < k) r += 1
    while (r > 1 && (r - 1) * (r - 1) >= k) r -= 1
    r.toInt
  }
}
