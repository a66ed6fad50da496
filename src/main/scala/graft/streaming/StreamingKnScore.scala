package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.EvalOps

/** Streaming KN perplexity filter: q244's held-out Kneser-Ney scorer
  * applied to a LIVE document feed — the ingestion-time quality gate
  * CCNet runs with KenLM (score every incoming doc against a trained
  * n-gram LM; route high-perplexity docs to review). The lexical-overlap
  * twin is [[StreamingDecontam]], the embedding twin
  * [[StreamingSemDecontam]]; this is the LM-quality member of the same
  * ingestion-guard architecture.
  *
  * Design: a document's score depends only on the document and the
  * STATIC trained model ([[EvalOps.knModel]] — the train-split
  * artifact, memoized per (session, dir)), so no cross-batch state,
  * watermark, or output-mode compromise is needed — each micro-batch
  * runs the exact batch semantics via `foreachBatch`. Bigram pairing
  * and the piecewise-rational integer surprisal go through
  * [[EvalOps.bigramsOf]] / [[EvalOps.scoreKn]] — the SAME
  * constructors q244 aggregates, so streaming and batch scores are
  * bit-identical by construction (StreamingKnScoreSpec pins this).
  */
object StreamingKnScore {

  /** Per-doc junk threshold: above ~5.5 bits/bigram (the gate corpora
    * sit near 4.4) a document's word sequences are mostly unseen or
    * rare transitions — scrambled/boilerplate text. */
  val JunkPermille = 5500L

  /** The trained model for a corpus dir — q244's exact artifact. */
  def modelOf(spark: SparkSession, dir: String): EvalOps.KnModel =
    EvalOps.knModel(spark, dir)

  /** Per-document verdicts for one (micro-)batch of documents
    * `(doc_id, lang, text, …)`: `(doc_id, lang, n_bigrams, sum_surp,
    * surp_permille, junk)`. Documents with fewer than two tokens score
    * no bigram and emit no row — exactly the batch scorer's domain.
    */
  def scoreBatch(batch: DataFrame, model: EvalOps.KnModel,
      junkPermille: Long = JunkPermille): DataFrame =
    EvalOps.scoreKn(
        EvalOps.bigramsOf(batch, withSplit = false), model)
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("surp")).as("sum_surp"))
      .withColumn("surp_permille",
        expr("(1000 * sum_surp) div n_bigrams"))
      .withColumn("junk", col("surp_permille") > junkPermille)

  /** Start the stream: every micro-batch of `docs` is scored against
    * the static `model` and the verdict frame is handed to `sink`.
    */
  def start(docs: DataFrame, model: EvalOps.KnModel,
      junkPermille: Long = JunkPermille)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(scoreBatch(batch, model, junkPermille), id)
      }
      .start()
}
