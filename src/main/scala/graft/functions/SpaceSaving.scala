package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy hitters (Metwally et al., "Efficient Computation
  * of Frequent and Top-k Elements in Data Streams", ICDT 2005) as a
  * typed one-pass aggregate — the sketch twin of the exact top-k n-gram
  * query (q88): q88's exact count shuffles every distinct gram; this
  * ships at most `capacity` (item, count, err) triples per partition,
  * independent of cardinality — the only viable shape when the distinct
  * domain itself doesn't fit (URLs, shingles at 100 TB).
  *
  * Guarantees (asserted in SpaceSavingSpec):
  *   - overestimate: count(i) >= true(i), count(i) - err(i) <= true(i);
  *   - any item with true frequency > n/capacity is in the summary.
  * Merge sums counts/errors for common items and charges each side's
  * worst-case unseen mass (its min counter, if it ever evicted) for
  * absent items — the mergeable-summaries construction, so the
  * guarantees survive arbitrary partitioning. Results are
  * partitioning-DEPENDENT within the error bound (like every SS
  * deployment), which is why the op is spec-gated on its bounds rather
  * than hash-matched against an oracle (same policy as the q38
  * sketches).
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[String, SpaceSaving.Buf, Seq[SpaceSaving.Hit]] {

  import SpaceSaving._
  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  override def zero: Buf = Buf(Map.empty, evicted = false)

  override def reduce(buf: Buf, item: String): Buf = {
    val m = buf.counts
    m.get(item) match {
      case Some(c) =>
        buf.copy(counts = m.updated(item, Cell(c.count + 1, c.err)))
      case None if m.size < capacity =>
        buf.copy(counts = m.updated(item, Cell(1L, 0L)))
      case None =>
        // evict the min-count item (ties: lexicographically smallest so
        // the result is a pure function of the input multiset order)
        val (minItem, minCell) = m.minBy { case (i, c) => (c.count, i) }
        Buf(m - minItem + (item -> Cell(minCell.count + 1, minCell.count)),
          evicted = true)
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (a.counts.isEmpty) return b
    if (b.counts.isEmpty) return a
    // worst-case count either side could hide for an item it lacks
    def floorOf(x: Buf): Long =
      if (x.evicted) x.counts.valuesIterator.map(_.count).min else 0L
    val (fa, fb) = (floorOf(a), floorOf(b))
    val items = a.counts.keySet ++ b.counts.keySet
    val merged = items.iterator.map { i =>
      val ca = a.counts.get(i)
      val cb = b.counts.get(i)
      val count = ca.map(_.count).getOrElse(fa) + cb.map(_.count).getOrElse(fb)
      val err = ca.map(_.err).getOrElse(fa) + cb.map(_.err).getOrElse(fb)
      i -> Cell(count, err)
    }.toSeq
    val kept = merged.sortBy { case (i, c) => (-c.count, i) }.take(capacity)
    Buf(kept.toMap, evicted =
      a.evicted || b.evicted || merged.size > capacity)
  }

  override def finish(buf: Buf): Seq[Hit] =
    buf.counts.toSeq
      .sortBy { case (i, c) => (-c.count, i) }
      .map { case (i, c) => Hit(i, c.count, c.err) }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[Hit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object SpaceSaving {
  final case class Cell(count: Long, err: Long)
  final case class Buf(counts: Map[String, Cell], evicted: Boolean)
  final case class Hit(item: String, count: Long, err: Long)
}
