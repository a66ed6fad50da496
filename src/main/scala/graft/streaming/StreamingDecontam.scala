package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.ReleaseOps

/** Streaming eval-set decontamination: q166's 13-gram overlap rule
  * applied to a LIVE document feed — the ingestion-time guard that keeps
  * eval-contaminated documents out of a training corpus as they arrive,
  * instead of by periodic batch sweeps.
  *
  * Design: the verdict for a document depends only on that document and
  * the STATIC train gram set, so no cross-batch state, watermark, or
  * output-mode compromise is needed — each micro-batch runs the exact
  * batch semantics via `foreachBatch` (the production pattern for
  * per-batch join+aggregate against static reference data). The train
  * gram frame is built once by [[ReleaseOps.explodedGramHashes]] —
  * the SAME expression chain q166 scans with, so streaming and batch
  * verdicts are bit-identical by construction (StreamingDecontamSpec
  * pins this) — and should be cached by the caller; Spark broadcasts or
  * shuffles it per batch exactly as it would for the batch join.
  *
  * At cluster scale the gram set is the big side: the per-batch join is
  * a shuffle on the 8-byte gh key, and a bloom prefilter (q162's
  * device) slots in front of the join unchanged if batch latency needs
  * thinning first — a bloom "no" is exact, so the verdict is unchanged.
  */
object StreamingDecontam {

  /** Per-doc contamination verdicts for one (micro-)batch of documents
    * `(doc_id, text, ...)`: `(doc_id, n_grams, n_hit, overlap_permille,
    * contaminated)`. Docs shorter than [[ReleaseOps.DecontamN]]
    * tokens carry no grams and yield no verdict row (same as q166's
    * batch scan).
    */
  def flagBatch(batch: DataFrame, trainGrams: DataFrame,
      thresholdPermille: Long = ReleaseOps.DecontamMax): DataFrame =
    ReleaseOps
      .explodedGramHashes(batch, ReleaseOps.DecontamN, Seq("doc_id"))
      .join(trainGrams.select(col("gh")).distinct()
        .withColumn("hit", lit(true)), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("hit"), 1)).as("n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
        expr("1000 * n_hit DIV n_grams").as("overlap_permille"))
      .withColumn("contaminated", col("overlap_permille") > thresholdPermille)

  /** The train-side gram set for a static corpus frame `(doc_id, text)`.
    * Callers should `.cache()` (or `localCheckpoint`) the result — it is
    * re-read every micro-batch.
    */
  def trainGramSet(train: DataFrame): DataFrame =
    ReleaseOps
      .explodedGramHashes(train, ReleaseOps.DecontamN, Seq("doc_id"))
      .select(col("gh")).distinct()

  /** Start the stream: every micro-batch of `docs` is flagged against
    * `trainGrams` and the verdict frame is handed to `sink`.
    */
  def start(docs: DataFrame, trainGrams: DataFrame,
      thresholdPermille: Long = ReleaseOps.DecontamMax)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, trainGrams, thresholdPermille), id)
      }
      .start()
}
