package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of the q113 snapshot diff
  * ([[graft.queries.ReleaseOps.q113]]): snapshot B arrives as a
  * STREAM of (doc_id, fp_b) fingerprint rows instead of a complete
  * relation, and the diff accrues incrementally — the CDC-ingest shape,
  * where the next release lands file-by-file over hours and the release
  * audit must not wait for the last file to start comparing.
  *
  * Per micro-batch: dedupe on doc_id, LEFT-join against snapshot A's
  * static fingerprint index, classify each B doc (added / changed /
  * unchanged), and append to a parquet status ledger partitioned by
  * `batch` = the foreachBatch batchId. Partitioning by batchId is what
  * makes the sink an idempotent upsert under at-least-once replay: a
  * replayed batch dynamically OVERWRITES exactly its own partition and
  * no other batch's rows (the `day`-partition variant of this pattern
  * is proven in ForeachBatchUpsertSpec; here the batch id is the only
  * correct partition key because doc ids carry no time structure).
  *
  * "removed" is the one status that cannot be emitted incrementally —
  * a doc is removed only if NO batch ever delivers it, decidable at
  * stream end. [[report]] finalizes: A anti-join the ledger's seen ids
  * → removed rows, union with the ledger, aggregate to the exact
  * (status, n_docs, id_sum) contract of the batch q113.
  *
  * Scale shape: the per-batch join is a small batch against the 100 TB
  * A-side index — at scale A buckets by doc_id and the join is
  * storage-partitioned (same co-partitioning argument as batch q113);
  * the ledger is narrow (doc_id, status) and the finalize anti-join is
  * one co-partitioned pass. Nothing ever collects to the driver.
  */
object SnapshotDiffStream {

  /** Classify one micro-batch of B-side fingerprints against A.
    * Within-batch duplicates collapse to the min fingerprint (same
    * determinism rule as ForeachBatchUpsertSpec's upsert).
    */
  private[graft] def classify(aFp: DataFrame, batch: DataFrame): DataFrame =
    batch
      .groupBy(col("doc_id")).agg(min(col("fp_b")).as("fp_b"))
      .join(aFp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"))

  /** The foreachBatch sink: classify and upsert into the status ledger
    * at `target`, idempotently (dynamic overwrite of this batch's own
    * partition only).
    */
  def diffSink(aFp: DataFrame, target: String)(batch: DataFrame, batchId: Long): Unit =
    classify(aFp, batch)
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch")
      .parquet(target)

  /** Finalize the incremental diff: ledger statuses + removed (A docs
    * no batch delivered), aggregated to q113's exact output contract.
    *
    * The ledger is deduplicated on doc_id first (earliest batch wins,
    * ties to the smaller status string — a total order, so the pick is
    * deterministic): replay of the SAME batch is already idempotent via
    * the partition overwrite, but an at-least-once SOURCE may redeliver
    * a doc in a LATER batch with a different batchId, and that row must
    * not double-count.
    */
  def report(spark: SparkSession, aFp: DataFrame, target: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ledger = spark.read.parquet(target)
      .select(col("doc_id"), col("status"), col("batch"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("batch"), col("status"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("status"))
    val removed = aFp
      .join(ledger.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("removed").as("status"))
    ledger.unionAll(removed)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("status"))
  }
}
