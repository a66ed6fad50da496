package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate folding quantized embedding vectors into the full
  * second-moment summary PCA needs — n, the per-dimension sums s(i) and
  * the Gramian Σ qᵢqⱼ — in ONE pass with a single flat `Array[Long]`
  * buffer (the [[MinHashAggregator]] pattern). Map-side partial
  * aggregation ships exactly `2 + d + d²` longs per partition
  * (4,161 for d = 64), independent of row count, and no per-row
  * struct/explode materialization ever exists: each row's 64×64 outer
  * product is accumulated directly into the buffer by a tight loop.
  *
  * Buffer layout (row-major): `[n, dims, s(0..d-1), gram(0,0..d-1),
  * gram(1,0..d-1), …]`. Ragged inputs are supported — the buffer grows
  * to the widest vector seen and re-indexes the triangular copy — and a
  * NULL/empty embedding contributes only its `n` increment, matching
  * the count(*)-over-all-rows contract of q219's oracle.
  *
  * All arithmetic is int64 on floor(x·128) quantized values: |q| < 2⁸
  * ⇒ each product < 2¹⁶, so the Gramian stays exact for n < 2⁴⁷ rows —
  * far beyond the 100 TB design point for 64-dim embeddings.
  */
class GramianAggregator extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  private def alloc(d: Int): Array[Long] = {
    val buf = new Array[Long](2 + d + d * d)
    buf(1) = d.toLong
    buf
  }

  /** Re-lay an existing buffer into one sized for `d` dims (d ≥ old). */
  private def grow(buf: Array[Long], d: Int): Array[Long] = {
    val od = buf(1).toInt
    if (od == d) return buf
    val out = alloc(d)
    out(0) = buf(0)
    var i = 0
    while (i < od) {
      out(2 + i) = buf(2 + i)
      var j = 0
      while (j < od) {
        out(2 + d + i * d + j) = buf(2 + od + i * od + j)
        j += 1
      }
      i += 1
    }
    out
  }

  override def zero: Array[Long] = alloc(0)

  override def reduce(buf0: Array[Long], v: Seq[Long]): Array[Long] = {
    val q: Array[Long] = v match {
      case null => Array.emptyLongArray
      case w: scala.collection.immutable.ArraySeq.ofLong => w.unsafeArray
      case w => w.toArray
    }
    val d = q.length
    val buf = if (d > buf0(1).toInt) grow(buf0, d) else buf0
    val bd = buf(1).toInt
    buf(0) += 1L
    var i = 0
    while (i < d) {
      val qi = q(i)
      buf(2 + i) += qi
      val row = 2 + bd + i * bd
      var j = 0
      while (j < d) {
        buf(row + j) += qi * q(j)
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a0: Array[Long], b0: Array[Long]): Array[Long] = {
    val d = math.max(a0(1).toInt, b0(1).toInt)
    val a = grow(a0, d)
    val b = grow(b0, d)
    a(0) += b(0)
    var k = 2
    while (k < a.length) {
      a(k) += b(k)
      k += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
