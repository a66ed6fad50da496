package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate detection: the online twin of the batch
  * MinHash+LSH pipeline (q21/q78/q87) — drop near-dup documents as they
  * arrive instead of re-clustering the corpus nightly.
  *
  * Shape: every doc gets its 16-hash MinHash signature in a narrow
  * stateless projection (the same native `minhash_sig` expression as
  * batch, bit-identical); the first `BandRows` hashes form the LSH
  * bucket key, and per-bucket `flatMapGroupsWithState` keeps the
  * signatures seen so far. A new doc whose signature agrees with a
  * stored one on >= `AgreeThreshold` of 16 hashes is flagged a
  * duplicate of the EARLIEST such doc; otherwise it is kept and its
  * signature joins the state.
  *
  * Single-band formulation: each doc lives in exactly one group, so
  * keep/duplicate is decided in one place with no cross-group vote
  * (production recall wants B parallel band-streams OR'd together —
  * same operator, B times). State per bucket is bounded BOTH ways:
  * capped at `MaxSigsPerBucket` signatures (keep-earliest, the
  * deterministic choice — same rationale as the batch hot-bucket cap
  * in `Dedup.MaxBucketDocs`) AND expired by an event-time timeout once
  * the watermark passes the bucket's last activity + `StateTtlMs`
  * (same mechanism as StatefulSessionize) — so state is
  * O(active buckets), not O(stream length). Callers must set a
  * watermark on `ts` for the TTL to advance.
  */
object StreamingNearDup {

  val NumHashes = 16
  val BandRows = 4
  val AgreeThreshold = 8
  val MaxSigsPerBucket = 256
  val StateTtlMs: Long = 60 * 60 * 1000L

  /** `ts` stays a TIMESTAMP (not epoch millis): the event-time tag from
    * the caller's watermark must reach the stateful operator or Spark
    * rejects EventTimeTimeout.
    */
  final case class DocSig(doc_id: Long, bucket: String, sig: Array[Long],
      ts: java.sql.Timestamp)
  final case class SigEntry(docId: Long, sig: Array[Long])
  final case class BucketState(sigs: List[SigEntry], lastMs: Long)
  /** dup_of = -1 when the doc is kept. */
  final case class DedupOut(doc_id: Long, kept: Boolean, dup_of: Long)

  /** Stateless signature + bucket projection — works identically on a
    * static or streaming DataFrame with (doc_id, text, ts). The
    * watermarked TIMESTAMP `ts` is carried through unchanged — the
    * event-time tag on it is what lets the stateful operator use
    * EventTimeTimeout.
    *
    * Docs too short for 3-word shingles fall back to ONE whole-text
    * shingle, so every doc gets a keep/dup verdict (batch q87 keeps
    * short docs too; dropping them here would make the online and
    * batch pipelines disagree on the surviving corpus). For them the
    * signature is a pure function of the full text: exact dups are
    * flagged, anything else is kept.
    */
  def signatures(docs: DataFrame): Dataset[DocSig] = {
    import docs.sparkSession.implicits._
    val bandCols = (0 until BandRows)
      .map(r => element_at(col("sig"), r + 1).cast("string"))
    docs
      .select(col("doc_id"), col("ts"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), col("ts"),
        graft.functions.MinHashSig.minhashSig(expr(
          """CASE WHEN size(toks) >= 3
            |  THEN array_distinct(transform(sequence(0, size(toks)-3),
            |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
            |  ELSE array(concat_ws(' ', toks)) END"""
            .stripMargin), NumHashes).as("sig"))
      .select(col("doc_id"), md5(concat_ws(",", bandCols: _*)).as("bucket"),
        col("sig"), col("ts"))
      .as[DocSig]
  }

  def dedup(sigs: Dataset[DocSig]): Dataset[DedupOut] = {
    import sigs.sparkSession.implicits._
    sigs.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DedupOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process)
  }

  private def agreement(a: Array[Long], b: Array[Long]): Int =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }

  private[streaming] def process(
      bucket: String,
      docs: Iterator[DocSig],
      state: GroupState[BucketState]): Iterator[DedupOut] = {
    if (state.hasTimedOut) {
      // the watermark passed last activity + TTL: near-dups of docs
      // this old are accepted as fresh — the bounded-state tradeoff
      state.remove()
      return Iterator.empty
    }
    val st0 = state.getOption.getOrElse(BucketState(Nil, Long.MinValue))
    var sigs = st0.sigs
    var lastMs = st0.lastMs
    val out = Seq.newBuilder[DedupOut]
    // doc_id order within the batch so keep/dup decisions don't depend
    // on partition iteration order
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      lastMs = math.max(lastMs, d.ts.getTime)
      // stored earliest-first: the first hit IS the earliest match
      val hit = sigs.find(e => agreement(e.sig, d.sig) >= AgreeThreshold)
      hit match {
        case Some(e) =>
          out += DedupOut(d.doc_id, kept = false, dup_of = e.docId)
        case None =>
          out += DedupOut(d.doc_id, kept = true, dup_of = -1L)
          if (sigs.size < MaxSigsPerBucket)
            sigs = sigs :+ SigEntry(d.doc_id, d.sig)
      }
    }
    state.update(BucketState(sigs, lastMs))
    state.setTimeoutTimestamp(lastMs + StateTtlMs)
    out.result().iterator
  }
}
