package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate computing a k-wide MinHash signature in ONE pass over
  * pre-hashed shingles (the `TypedImperativeAggregate`-style option
  * SURVEY.md §4 reserved for the 100 TB design point): the buffer is a
  * single `Array[Long]`, `reduce` folds each shingle hash through the
  * whole universal-hash family, and `merge` is element-wise min — so
  * map-side partial aggregation ships exactly k longs per doc per
  * partition, independent of shingle count.
  *
  * Input values are [[CrossHash.h60]] hashes, so signatures are identical
  * to the expression-based 16×`min()` formulation in `Dedup.q21`
  * (equivalence is asserted in MinHashAggregatorSpec).
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  import CrossHash.{P, hashA, hashB}
  require(numHashes <= hashA.length)

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val hp = h % P
    var j = 0
    while (j < numHashes) {
      val v = (hashA(j) * hp + hashB(j)) % P
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (b(j) < a(j)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
