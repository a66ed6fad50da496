package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as reusable operators: skew-salted joins and
  * bucketed co-located joins. These are the knobs a 1000-executor /
  * 100 TB deployment reaches for when AQE's automatic handling isn't
  * enough (extreme single-key skew, repeated joins on the same key).
  */
object ScaleOps {

  /** Salted inner equi-join for skewed fact keys: the fact side gets a
    * random-free DETERMINISTIC salt (hash of other columns modulo
    * `saltBuckets`), the dim side is exploded `saltBuckets`× so every
    * (key, salt) pair finds its match. Result rows are identical to a
    * plain join; the shuffle spreads a hot key over `saltBuckets`
    * reducers.
    *
    * Note: when the dim side is broadcastable, prefer `broadcast()` —
    * salting is for two large sides. AQE's skew-join handles moderate
    * skew automatically; explicit salting covers the pathological case
    * (one key ≫ a partition).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.filter(_ != key).map(col).toSeq: _*),
        lit(saltBuckets)))
    val saltedDim = dim
      .withColumn("__salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Range-partitioned, sorted-within-partition write: the layout that
    * makes downstream scans prunable. Every output file covers a
    * disjoint key range and is internally sorted, so parquet row-group
    * min/max statistics line up with predicates (a range filter touches
    * only the files whose range intersects) and merge-style consumers
    * stream in key order. At 100 TB this is the difference between a
    * full scan and reading a handful of files.
    */
  def writeRangePartitioned(
      df: DataFrame,
      key: String,
      partitions: Int,
      path: String): Unit =
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)

  /** Write both sides bucketed by the join key so subsequent joins are
    * shuffle-free (bucket-local). Returns the registered table names.
    *
    * OPTIMIZATION r17 (guide §6 "partitioning on write", §2.6): the
    * input is hash-clustered into `buckets` partitions on the bucket
    * key BEFORE the write. Without it every input partition writes one
    * file per bucket it touches (inputPartitions × buckets small files
    * — the many-small-files trap) and a single-partition input writes
    * all buckets serially in ONE task (QProfile r17: q214's two writes
    * were 1-task stages of 1.12 s + 0.50 s on a 32-core session).
    * `repartition(buckets, key)` is the same HashPartitioning the
    * bucket spec requires, so each task writes exactly its own bucket
    * file: `buckets` parallel tasks, `buckets` output files. This is
    * the hash write-distribution mode table formats standardize; the
    * shuffle it adds carries each row once — the layout pass IS the
    * point of bucketing.
    */
  def writeBucketed(
      df: DataFrame,
      key: String,
      buckets: Int,
      tableName: String,
      path: String): String = {
    df.repartition(buckets, col(key))
      .write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(tableName)
    tableName
  }

  /** Bloom-prefiltered semi-join: the pattern for "is this key in that
    * OTHER big table" when the build side is too large to broadcast as
    * a hash relation but fits as bloom BITS (~10 bits/key at 1% fpp vs
    * ~50+ bytes/key for a hash table — a 200M-key blocklist is ~250 MB
    * of bloom vs ~12 GB of hash relation).
    *
    * Build: one distributed partial+final BloomFilterAggregate over the
    * build side — the same Catalyst machinery Spark's own
    * InjectRuntimeFilter uses for shuffle-join runtime filters, exposed
    * as an operator for the cross-table prefilters the optimizer cannot
    * infer on its own. Exactly one serialized filter reaches the
    * driver. Probe: `might_contain` evaluates INSIDE whole-stage
    * codegen on the probe side's scan — rows drop before the shuffle.
    * Bloom false positives are then removed by a real semi-join over
    * the (pre-shrunk) survivor set, so the result is EXACT — identical
    * rows to `big SEMI JOIN small`.
    */
  /** The bloom PREFILTER alone: rows of `big` whose key might be in
    * `small` (false positives possible — bloom fpp only; exactness
    * comes from [[bloomSemiJoin]]'s verify join). Exposed separately so
    * selectivity is testable and so callers can place the verify join
    * after further narrowing. `expectedItems` MUST be sized to the
    * build side's cardinality: an oversized filter wastes MBs of
    * partial-buffer merge; an undersized one saturates (fpp → 1) and
    * stops filtering.
    */
  def bloomProbe(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(small(smallKey))), expectedItems)
        .toAggregateExpression())
    val bytes = small.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    if (bytes == null) return big.limit(0) // empty build side
    val probe = ColumnBridge.column(new BloomFilterMightContain(
      Literal.create(bytes, BinaryType),
      ColumnBridge.expression(xxhash64(big(bigKey)))))
    big.filter(probe)
  }

  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long): DataFrame = {
    val keys = small.select(small(smallKey)).distinct()
    bloomProbe(big, small, bigKey, smallKey, expectedItems)
      .join(keys, big(bigKey) === keys(smallKey), "left_semi")
  }

  /** As above, sizing the bloom from the build side's measured count —
    * one extra count job over `small` (cheap next to a mis-sized
    * filter at any scale factor). Prefer the explicit-size overload
    * when the caller already knows the cardinality.
    */
  def bloomSemiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String): DataFrame =
    bloomSemiJoin(big, small, bigKey, smallKey,
      math.max(1L, small.count()))
}
