package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.FingerprintOps

/** Streaming winnow-index probe: q210's overlap detection applied to a
  * LIVE document feed — the ingestion-time guard that flags an arriving
  * document whose content already sits (wholly or as a long passage) in
  * an indexed corpus, BEFORE it lands in the training set. The
  * winnowing guarantee carries over verbatim: any shared passage of
  * ≥ k+w−1 tokens between an arriving doc and an indexed doc shares at
  * least one selected fingerprint, so recall over passages of that
  * length is structural, not probabilistic.
  *
  * Design: a verdict depends only on the arriving document and the
  * STATIC index, so no cross-batch state, watermark, or output-mode
  * compromise is needed — each micro-batch runs the exact batch
  * semantics via `foreachBatch` (the [[StreamingDecontam]] pattern).
  * Fingerprint construction routes through
  * [[FingerprintOps.gramStreamOf]]/[[FingerprintOps.selectedFpsOf]] — the
  * SAME chain the batch index and q207/q210 use — so live and batch
  * verdicts are bit-identical by construction (StreamingWinnowSpec pins
  * this). At cluster scale the index is the big side: the per-batch
  * join shuffles on the 8-byte fingerprint key; the [[FingerprintOps
  * .WinnowMaxDf]] cap already bounded any fingerprint's posting list
  * when the index was built.
  */
object StreamingWinnow {

  /** The probe index of a static corpus frame `(doc_id, text, ...)`:
    * (wh, doc_id) postings with boilerplate fingerprints (df >
    * [[FingerprintOps.WinnowMaxDf]]) dropped — one viral footer
    * fingerprint would otherwise fan every arriving doc into its whole
    * posting list. Callers should cache/checkpoint the result; it is
    * re-read every micro-batch.
    */
  def indexOf(corpus: DataFrame): DataFrame = {
    val fps = FingerprintOps
      .selectedFpsOf(FingerprintOps.gramStreamOf(corpus, Seq.empty), Seq.empty)
    fps.join(
      fps.groupBy(col("wh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= FingerprintOps.WinnowMaxDf)
        .select(col("wh")),
      Seq("wh"), "left_semi")
      .select(col("wh"), col("doc_id").as("index_doc_id"))
  }

  /** Probe one (micro-)batch of documents `(doc_id, text, ...)` against
    * the index: for each arriving doc with at least `minShared` shared
    * fingerprints with SOME indexed doc, the best match (most shared,
    * ties to the lowest indexed id) with the share count and the
    * containment permille against the ARRIVING doc's own fingerprint
    * set ("how much of this doc is already indexed"). Docs too short to
    * fingerprint, or with no qualifying match, yield no row.
    */
  def probeBatch(batch: DataFrame, index: DataFrame,
      minShared: Long = 1L): DataFrame = {
    val fps = FingerprintOps
      .selectedFpsOf(FingerprintOps.gramStreamOf(batch, Seq.empty), Seq.empty)
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fps"))
    fps.join(index, Seq("wh"))
      .groupBy(col("doc_id"), col("index_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      // best match per arriving doc: most shared, ties to lowest id —
      // a min-struct aggregate, no window needed on the tiny match frame
      .groupBy(col("doc_id"))
      .agg(max(struct(col("n_shared").as("s"),
        (-col("index_doc_id")).as("nid"))).as("best"))
      .join(sizes, Seq("doc_id"))
      .select(col("doc_id"),
        (-col("best.nid")).as("match_doc_id"),
        col("best.s").as("n_shared"),
        expr("1000 * best.s DIV n_fps").as("containment_permille"))
  }

  /** Start the stream: every micro-batch of `docs` is probed against
    * `index` and the match frame is handed to `sink`.
    */
  def start(docs: DataFrame, index: DataFrame, minShared: Long = 1L)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(probeBatch(batch, index, minShared), id)
      }
      .start()
}
