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
  * Two formulations share the operator:
  *   - single-band ([[signatures]] → [[dedup]]): each doc lives in
  *     exactly one group, keep/dup decided in one place — cheapest, but
  *     recall is limited to one band's collisions;
  *   - multi-band ([[signaturesBanded]] → [[dedupBanded]] →
  *     [[combineBanded]]): each doc explodes onto `NumBands` band
  *     buckets (band index baked into the bucket key, so the SAME
  *     stateful operator processes all bands as disjoint key ranges),
  *     and a doc is a duplicate iff ANY band matched it — the OR is a
  *     per-doc windowed min/bool-and aggregation, exactly the batch
  *     LSH candidate rule, so streaming recall matches batch q21/q87
  *     candidate recall (StreamingNearDupSpec measures both). A doc
  *     dropped by one band may still seed another band's state; a later
  *     dup_of can therefore point at a dropped doc — chain links, the
  *     same transitivity batch resolves with connected components.
  *
  * State per bucket is bounded BOTH ways:
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
  val NumBands = 4 // NumBands * BandRows == NumHashes: bands tile the signature
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
  /** Per-band verdict — carries the event-time `ts` so the OR-combine
    * can run as a downstream windowed streaming aggregation.
    */
  final case class BandVerdict(doc_id: Long, kept: Boolean, dup_of: Long,
      ts: java.sql.Timestamp)

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

  /** Like [[signatures]] but one row per (doc, band): band `b` buckets
    * on hashes [b·BandRows, (b+1)·BandRows) of the same 16-hash
    * signature, with the band index baked into the bucket key so bands
    * occupy disjoint key ranges of one stateful operator.
    */
  def signaturesBanded(
      docs: DataFrame, numBands: Int = NumBands): Dataset[DocSig] = {
    import docs.sparkSession.implicits._
    require(numBands >= 1 && numBands * BandRows <= NumHashes,
      s"numBands=$numBands does not tile $NumHashes hashes in rows of $BandRows")
    val bucketCols = (0 until numBands).map { b =>
      val rows = (0 until BandRows)
        .map(r => element_at(col("sig"), b * BandRows + r + 1).cast("string"))
      md5(concat_ws(",", lit(b.toString) +: rows: _*))
    }
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
      .select(col("doc_id"), explode(array(bucketCols: _*)).as("bucket"),
        col("sig"), col("ts"))
      .as[DocSig]
  }

  /** Per-band verdicts: a doc appears once per band, flagged iff THAT
    * band's bucket held a high-agreement signature. OR them with
    * [[combineBanded]] for the final keep/drop.
    */
  def dedupBanded(sigs: Dataset[DocSig],
      windowLenMs: Long = 60000L): Dataset[BandVerdict] = {
    import sigs.sparkSession.implicits._
    sigs.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, BandVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processBanded(windowLenMs))
  }

  /** OR of the per-band verdicts: dup iff any band matched; dup_of is
    * the smallest matched doc id across bands (deterministic). All B
    * verdicts of a doc share its event timestamp, so grouping on
    * (window(ts), doc_id) reunites exactly that doc's bands; the window
    * closes — and the verdict emits — once the watermark passes it.
    * The watermark is re-declared here (`delay`): the event-time tag
    * does not survive through flatMapGroupsWithState's new Dataset.
    * Works identically on a static Dataset (no window wait).
    *
    * Spark's global-watermark check rejects ANY
    * flatMapGroupsWithState → stateful-op chain because a stateful op
    * may emit rows older than the watermark. This one cannot:
    * [[processBanded]] stamps each verdict with the input row's OWN
    * event time (and drops rows already older than the watermark), so
    * the aggregation sees exactly the source's lateness profile —
    * never anything older. Starting the streaming query therefore
    * requires `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false`; this builder does NOT touch session conf — wrap
    * the `.start()` in [[withStatefulChainUnchecked]], which scopes the
    * override and restores the prior value, so unrelated streaming
    * queries keep Spark's fail-fast guard.
    */
  def combineBanded(perBand: Dataset[BandVerdict],
      windowLen: String = "1 minute",
      delay: String = "10 minutes"): DataFrame = {
    val src = if (perBand.isStreaming) perBand.withWatermark("ts", delay)
    else perBand
    src
      .groupBy(window(col("ts"), windowLen), col("doc_id"))
      .agg(min(col("kept")).as("kept"),
        coalesce(min(when(col("dup_of") >= 0L, col("dup_of"))), lit(-1L))
          .as("dup_of"))
      .select(col("doc_id"), col("kept"), col("dup_of"))
  }

  /** Runs `body` (which should `.start()` — and, to be race-free, also
    * await — the banded streaming query) with Spark's stateful-operator
    * correctness check disabled, restoring the caller's prior setting
    * afterwards. The check is a start-time plan rejection of ANY
    * flatMapGroupsWithState → stateful-agg chain; [[combineBanded]]'s
    * chain is provably safe (verdicts carry the source row's own event
    * time), but the override must not leak to unrelated queries in the
    * same session — a later, genuinely unsafe chain deserves the
    * fail-fast.
    */
  def withStatefulChainUnchecked[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def agreement(a: Array[Long], b: Array[Long]): Int =
    a.iterator.zip(b.iterator).count { case (x, y) => x == y }

  /** Core per-bucket loop: verdict each doc against the stored
    * signatures (earliest-first, so the first hit is the earliest
    * match), insert novel ones up to the cap, refresh the TTL clock.
    * Returns (doc, earliest match if any) in doc_id order.
    */
  private def verdictLoop(
      docs: Iterator[DocSig],
      state: GroupState[BucketState]): Seq[(DocSig, Option[Long])] = {
    val st0 = state.getOption.getOrElse(BucketState(Nil, Long.MinValue))
    var sigs = st0.sigs
    var lastMs = st0.lastMs
    val out = Seq.newBuilder[(DocSig, Option[Long])]
    // doc_id order within the batch so keep/dup decisions don't depend
    // on partition iteration order
    docs.toSeq.sortBy(_.doc_id).foreach { d =>
      lastMs = math.max(lastMs, d.ts.getTime)
      sigs.find(e => agreement(e.sig, d.sig) >= AgreeThreshold) match {
        case Some(e) => out += ((d, Some(e.docId)))
        case None =>
          out += ((d, None))
          if (sigs.size < MaxSigsPerBucket)
            sigs = sigs :+ SigEntry(d.doc_id, d.sig)
      }
    }
    state.update(BucketState(sigs, lastMs))
    state.setTimeoutTimestamp(lastMs + StateTtlMs)
    out.result()
  }

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
    verdictLoop(docs, state).iterator.map {
      case (d, Some(of)) => DedupOut(d.doc_id, kept = false, dup_of = of)
      case (d, None) => DedupOut(d.doc_id, kept = true, dup_of = -1L)
    }
  }

  /** Banded verdicts drop too-late rows BEFORE they touch state:
    * flatMapGroupsWithState itself processes late rows, but
    * [[combineBanded]]'s window aggregation discards a verdict whose
    * 1-minute window has already closed (window END <= watermark) —
    * without this filter such docs would mutate bucket state yet
    * silently receive no verdict. The cutoff is WINDOW-ALIGNED, not the
    * raw watermark: a row with ts in [window_start(wm), wm) still lands
    * in an open window and gets its verdict, so it must be processed
    * (an `ts >= wm` filter would wrongly drop it — review finding,
    * round 6). `windowLenMs` must equal [[combineBanded]]'s windowLen;
    * both default to one minute. With the filter, a too-late doc
    * neither pollutes state nor emits (documented: banded mode gives
    * too-late docs NO verdict, unlike single-band [[dedup]] which
    * always emits one). Batch runs have no watermark — nothing is
    * dropped there.
    */
  private[streaming] def processBanded(windowLenMs: Long)(
      bucket: String,
      docs: Iterator[DocSig],
      state: GroupState[BucketState]): Iterator[BandVerdict] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val wm = try state.getCurrentWatermarkMs()
    catch { case _: UnsupportedOperationException => Long.MinValue }
    // accepted ⟺ the row's window is still open ⟺ ts >= window_start(wm)
    val cutoff =
      if (wm == Long.MinValue) Long.MinValue
      else Math.floorDiv(wm, windowLenMs) * windowLenMs
    val live = docs.filter(_.ts.getTime >= cutoff)
    verdictLoop(live, state).iterator.map {
      case (d, Some(of)) => BandVerdict(d.doc_id, kept = false, dup_of = of, ts = d.ts)
      case (d, None) => BandVerdict(d.doc_id, kept = true, dup_of = -1L, ts = d.ts)
    }
  }
}
