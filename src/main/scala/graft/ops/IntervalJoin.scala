package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval-overlap join — the equi-join reformulation of a
  * predicate Spark can otherwise only plan as BroadcastNestedLoopJoin
  * (the 100 TB scale-killer: every pair of partitions meets).
  *
  * `a.start <= b.end AND b.start <= a.end` has no equi key, so each
  * side is exploded onto fixed-width time buckets (one row per bucket
  * the interval touches) and the join runs as a plain shuffled
  * equi-join on the bucket id with the overlap predicate as residual.
  * A pair of overlapping intervals shares every bucket in
  * [max(startBucket), min(endBucket)] — emitting the match ONLY in the
  * first common bucket (`bucket == greatest(a.startBucket,
  * b.startBucket)`) makes each pair appear exactly once with NO
  * distinct/dedup shuffle afterwards.
  *
  * Tuning: `bucketWidth` ~ the typical interval length. Too small →
  * explode amplification (rows × span/width); too large → residual
  * filtering does the work. Both engines see identical semantics
  * either way, it is purely a physical knob. The no-width overload
  * derives it from the data ([[autoBucketWidth]]) so a corpus with
  * 1000× wider intervals cannot silently explode.
  */
object IntervalJoin {

  /** Row cap per side for [[autoBucketWidth]]'s knob derivation:
    * 2 × 65536 longs ≈ 1 MB on the driver, plenty for a p50.
    */
  val AutoWidthSampleRows: Int = 1 << 16

  /** Median interval length across both sides, derived from a
    * row-count-capped scan: `head(sampleRows)` per side plans as
    * CollectLimit, which executes partitions incrementally and stops
    * once the cap is filled — O(sample) rows read whatever the corpus
    * size (the previous full-input `approx_percentile` pass cost
    * O(corpus) at 100 TB for a knob whose value only needs to be in
    * the right decade). Inputs at or under the cap are read in full,
    * so small corpora keep an exact median for free; above it the p50
    * comes from the first files the scan touches — acceptable bias for
    * a purely physical knob (bucket width never changes join
    * semantics), same derive-from-the-data pattern as
    * [[ScaleOps.bloomSemiJoin]]'s auto-sizing. With width ≈ p50
    * length, a typical interval touches ≤ 2 buckets, so the explode
    * factor stays O(1) whatever the time unit or corpus regime.
    */
  def autoBucketWidth(
      a: DataFrame,
      b: DataFrame,
      startA: String,
      endA: String,
      startB: String,
      endB: String,
      sampleRows: Int = AutoWidthSampleRows): Long = {
    def sampleLens(df: DataFrame, s: String, e: String): Array[Long] =
      df.select((col(e).cast("long") - col(s).cast("long") + 1L).as("len"))
        .where(col("len").isNotNull)
        .head(sampleRows).map(_.getLong(0))
    val lens = sampleLens(a, startA, endA) ++ sampleLens(b, startB, endB)
    if (lens.isEmpty) 1L
    else {
      java.util.Arrays.sort(lens)
      math.max(1L, lens(lens.length / 2))
    }
  }

  /** [[overlapJoin]] with `bucketWidth` auto-derived from the median
    * interval length of the actual inputs.
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      startA: String,
      endA: String,
      startB: String,
      endB: String): DataFrame =
    overlapJoin(a, b, startA, endA, startB, endB,
      autoBucketWidth(a, b, startA, endA, startB, endB))

  /** All pairs (a row, b row) whose [startA, endA] and [startB, endB]
    * (inclusive, integral) overlap. Column names across `a` and `b`
    * must be disjoint; intervals must satisfy start <= end.
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      startA: String,
      endA: String,
      startB: String,
      endB: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // an inverted interval would silently generate a DESCENDING bucket
    // sequence (Spark's sequence() auto-steps -1) and drop matches —
    // enforce the documented precondition loudly instead
    def checkedEnd(s: String, e: String) =
      when(col(e) >= col(s), col(e)).otherwise(raise_error(concat(
        lit(s"overlapJoin: interval end $e < start $s at "),
        col(s).cast("string"))))
    def bucketed(df: DataFrame, s: String, e: String) = df.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor(checkedEnd(s, e) / bucketWidth).cast("long"))))
    val ab = bucketed(a, startA, endA)
    val bb = bucketed(b, startB, endB)
      .withColumnRenamed("__bucket", "__bucket_b")
    ab.join(bb,
        col("__bucket") === col("__bucket_b") &&
        col(startA) <= col(endB) && col(startB) <= col(endA) &&
        col("__bucket") === greatest(
          floor(col(startA) / bucketWidth).cast("long"),
          floor(col(startB) / bucketWidth).cast("long")))
      .drop("__bucket", "__bucket_b")
  }
}
