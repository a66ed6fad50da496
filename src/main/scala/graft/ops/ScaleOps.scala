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
    */
  def writeBucketed(
      df: DataFrame,
      key: String,
      buckets: Int,
      tableName: String,
      path: String): String = {
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(tableName)
    tableName
  }
}
