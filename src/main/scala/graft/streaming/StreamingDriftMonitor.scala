package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.ReleaseOps

/** Streaming twin of the q117 length-distribution drift monitor: the
  * next release's documents arrive as a STREAM (the crawl lands file by
  * file) and the drift-vs-shipped-corpus histogram must be consultable
  * WHILE it lands, not after — the observability loop that lets release
  * QA abort a bad crawl early.
  *
  * The running B histogram is a plain streaming aggregation over the
  * [[ReleaseOps.driftBin]] projection in COMPLETE output mode — state
  * is bounded by construction at [[ReleaseOps.DriftBins]] rows (20),
  * the smallest possible stateful-streaming footprint, and the sink
  * rewrite per micro-batch is 20 rows. No watermark is needed: bins
  * are a closed domain, not a time axis.
  *
  * [[drift]] then joins the live histogram against the static A-side
  * histogram (computed once from the shipped corpus) and emits exactly
  * q117's row shape — [[graft.StreamingDriftMonitorSpec]] pins
  * stream-fed == batch q117, including the integer per-mille shares.
  *
  * Scale shape: the per-batch work is a narrow projection + a 20-key
  * partial aggregate (map-side combine reduces every batch to ≤ 20
  * rows per task before the exchange); the drift join is 20×20.
  */
object StreamingDriftMonitor {

  /** Start the running-histogram query over a stream with a `len`
    * column; the live counts land in the in-memory table `queryName`
    * as (bin, n_b).
    */
  def start(lens: DataFrame, queryName: String, checkpointDir: String): StreamingQuery =
    lens
      .select(ReleaseOps.driftBin(col("len")).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_b"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** The static A-side histogram of the shipped corpus. */
  def staticHistogram(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.table(spark, dir, "documents")
      .select(ReleaseOps.driftBin(length(col("text"))).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_a"))

  /** Join the live B histogram (memory table `queryName`) against the
    * static A histogram and emit q117's exact output contract. Bins
    * present on only one side report zero on the other (full outer —
    * a drained or not-yet-seen length band is drift, not absence).
    */
  def drift(spark: SparkSession, aHist: DataFrame, queryName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.table(queryName)
      .join(aHist, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      // a zero total happens: tot_b before the first micro-batch lands
      // (the consult-while-landing case), tot_a against an empty corpus
      // — and Spark 4 runs ANSI mode by default, where `div 0` throws.
      // All that side's counts are 0 then, so clamping the divisor to 1
      // reports the correct all-zero shares instead of crashing.
      .withColumn("tot_a",
        greatest(sum(col("n_a")).over(Window.partitionBy()), lit(1L)))
      .withColumn("tot_b",
        greatest(sum(col("n_b")).over(Window.partitionBy()), lit(1L)))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr("1000 * n_a div tot_a").as("share_a_permille"),
        expr("1000 * n_b div tot_b").as("share_b_permille"),
        abs(expr("1000 * n_a div tot_a") - expr("1000 * n_b div tot_b"))
          .as("drift_permille"))
      .orderBy(col("bin"))
  }
}
