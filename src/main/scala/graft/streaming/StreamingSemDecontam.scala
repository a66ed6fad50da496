package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.EvalOps

/** Streaming SEMANTIC decontamination: q228's embedding-space leak rule
  * applied to a LIVE vector feed — the ingestion-time guard that keeps
  * paraphrased benchmark content (no n-gram overlap, near embedding)
  * out of a training corpus as it arrives. The lexical twin is
  * [[StreamingDecontam]] (q166's rule); this is the same architecture
  * one modality over.
  *
  * Design: a vector's verdict depends only on that vector and the
  * STATIC held-out panel, so no cross-batch state, watermark, or
  * output-mode compromise is needed — each micro-batch runs the exact
  * batch semantics via `foreachBatch`. Quantization and the min-d²
  * fold go through [[EvalOps.quantized64]] /
  * [[EvalOps.minD2ToPanel]] — the SAME constructors q228 scores
  * with, so streaming and batch verdicts are bit-identical by
  * construction (StreamingSemDecontamSpec pins this). The panel frame
  * is tiny and broadcast per batch, exactly as in batch.
  */
object StreamingSemDecontam {

  /** The quantized broadcast panel for a static embeddings frame —
    * q228's fixed held-out set. Callers should cache it; it is re-read
    * every micro-batch.
    */
  def panelOf(embeddings: DataFrame): DataFrame =
    EvalOps.quantized64(embeddings)
      .filter(EvalOps.isSemPanel(col("vec_id")))
      .select(col("vec_id").as("p_id"), col("qv").as("pv"))

  /** Per-vector verdicts for one (micro-)batch of embeddings
    * `(vec_id, label, embedding)`: `(vec_id, label, min_d2, leaked)`.
    * Panel members in the batch are excluded (they ARE the benchmark),
    * as are ragged non-64-dim vectors — both exactly as in q228.
    */
  def flagBatch(batch: DataFrame, panel: DataFrame,
      maxD2: Long = EvalOps.SemLeakD2Max): DataFrame =
    EvalOps.minD2ToPanel(
        EvalOps.quantized64(batch)
          .filter(not(EvalOps.isSemPanel(col("vec_id")))),
        panel)
      .withColumn("leaked", col("min_d2") <= maxD2)

  /** Start the stream: every micro-batch of `vectors` is flagged
    * against the static `panel` and the verdict frame is handed to
    * `sink`.
    */
  def start(vectors: DataFrame, panel: DataFrame,
      maxD2: Long = EvalOps.SemLeakD2Max)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(flagBatch(batch, panel, maxD2), id)
      }
      .start()
}
