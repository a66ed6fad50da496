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
  *
  * Buffer layout (the Stream-Summary role): a mutable item → cell hash
  * map plus a (count, item)-ordered index, so the per-row update is
  * O(log capacity) — remove/reinsert the touched key — and the min
  * eviction reads the index head instead of an O(capacity) scan, with
  * NO per-row persistent-map copying. Eviction semantics are unchanged:
  * min count, lexicographically-smallest item on ties, so the summary
  * stays a pure function of the input multiset order. The index is
  * rebuilt lazily after (de)serialization — Kryo ships only the map.
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[String, SpaceSaving.Buf, Seq[SpaceSaving.Hit]] {

  import SpaceSaving._
  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  override def zero: Buf = new Buf(mutable.HashMap.empty, false)

  override def reduce(buf: Buf, item: String): Buf = {
    buf.add(item, capacity)
    buf
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
    new Buf(mutable.HashMap.from(kept),
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
  final case class Cell(var count: Long, var err: Long)
  final case class Hit(item: String, count: Long, err: Long)

  /** Mutable Space-Saving buffer. `order` mirrors `counts` as a
    * (count, item)-sorted set; it is transient (Kryo's field serializer
    * skips it) and rebuilt on first use after deserialization.
    */
  final class Buf(
      val counts: mutable.HashMap[String, Cell],
      var evicted: Boolean) extends Serializable {

    @transient private var order: mutable.TreeSet[(Long, String)] = _

    private def index: mutable.TreeSet[(Long, String)] = {
      if (order == null) {
        order = mutable.TreeSet.empty[(Long, String)]
        counts.foreach { case (i, c) => order.add((c.count, i)) }
      }
      order
    }

    def add(item: String, capacity: Int): Unit = counts.get(item) match {
      case Some(c) =>
        index.remove((c.count, item))
        c.count += 1
        index.add((c.count, item))
      case None if counts.size < capacity =>
        counts.update(item, Cell(1L, 0L))
        index.add((1L, item))
      case None =>
        // evict the min-count item (ties: lexicographically smallest so
        // the result is a pure function of the input multiset order)
        val min @ (minCount, minItem) = index.head
        index.remove(min)
        counts.remove(minItem)
        counts.update(item, Cell(minCount + 1, minCount))
        index.add((minCount + 1, item))
        evicted = true
    }
  }
}
