package graft

import org.apache.spark.sql.functions._

import graft.queries.FingerprintOps

/** q210 candidate-volume pricing probe (VERDICT r14 item 4 — the q92/
  * q173 treatment): counts the winnow-bucket candidate-pair volume the
  * q210 pair join actually faces at a rung, so its wall-clock ratio can
  * be judged per TRUE candidate instead of per input row.
  *
  * Per fingerprint bucket of document frequency df, the pair join
  * emits C(df,2) candidate rows; buckets with df > WinnowMaxDf are
  * excluded by the hot-bucket cap (boilerplate). This probe reports:
  * selected-fp rows, bucket count, capped candidate pairs
  * Σ C(df,2) for 2 ≤ df ≤ cap, the UNcapped volume the cap saved,
  * how many buckets the cap dropped, and q210's wall time in the same
  * JVM — one number per rung for BASELINE.md.
  *
  * Usage: sbt "runMain graft.WinnowProbe <sfDir> [reps]"
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val sel = FingerprintOps.selectedFpsOf(
      FingerprintOps.gramStreamOf(
        graft.Tables.table(spark, sfDir, "documents"), Seq()), Seq())
      .localCheckpoint()
    val nSel = sel.count()
    val cap = FingerprintOps.WinnowMaxDf
    // DIV, not `/`: Column./ is double division — exact integer pair
    // counts are the whole point of the probe
    val stats = sel.groupBy(col("wh")).agg(count(lit(1)).as("df"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(expr(s"IF(df BETWEEN 2 AND $cap, df * (df - 1) DIV 2, 0L)"))
          .as("pairs_capped"),
        sum(expr("df * (df - 1) DIV 2")).as("pairs_uncapped"),
        sum(expr(s"IF(df > $cap, 1L, 0L)")).as("buckets_dropped"),
        max(col("df")).as("max_df"))
      .collect()(0)
    // an empty selection (every doc shorter than the winnow horizon)
    // leaves sum/max NULL — report zeros, don't NPE
    def lng(i: Int): Long = if (stats.isNullAt(i)) 0L else stats.getLong(i)
    println(s"[winnow] sf=$sfDir sel_rows=$nSel buckets=${lng(0)} " +
      s"pairs_capped=${lng(1)} pairs_uncapped=${lng(2)} " +
      s"buckets_dropped=${lng(3)} max_df=${lng(4)}")

    // df-band pair-volume histogram: what share of the candidate volume
    // would a TIGHTER cap shed (the 100 TB knob), per power-of-2 band
    val bands = sel.groupBy(col("wh")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .groupBy(expr("int(ceil(log2(df)))").as("band"))
      .agg(count(lit(1)).as("buckets"),
        sum(expr("df * (df - 1) DIV 2")).as("pairs"))
      .orderBy(col("band")).collect()
    bands.foreach(r => println(
      s"[winnow] df<=${1 << r.getInt(0)}: buckets=${r.getLong(1)} pairs=${r.getLong(2)}"))

    val runs = (0 to reps).map { i =>
      val t0 = System.nanoTime()
      graft.queries.FingerprintOps.q210(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.drop(1) // first run is the uncounted warm-up
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    println(f"[winnow] q210 runs ${runs.map(t => f"$t%.2f").mkString(" ")} s; " +
      f"median/pair ${median(runs) * 1e9 / lng(1).max(1)}%.0f ns")
    spark.stop()
  }
}
