package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-LSH (random-hyperplane) bucketing for embedding vectors — the
  * scale path behind cosine near-dup detection (q42): two vectors with
  * cosine similarity `s` agree on each hyperplane sign with probability
  * `1 - arccos(s)/π`, so near-duplicates collide in signature buckets
  * and the quadratic all-pairs scoring runs only within buckets.
  *
  * Hyperplanes are DETERMINISTIC but well-scrambled: components come
  * from a splitmix64-style finalizer over (plane, dim), so planes are
  * pairwise near-orthogonal in expectation (a raw LCG here produces
  * strongly correlated planes — measured up to 0.55 pairwise cosine —
  * which would inflate bucket sizes and the in-bucket quadratic cost).
  */
object SignLSH {

  /** Deterministic pseudo-random hyperplane component in [-1, 1).
    * Public: q42 derives integer-quantized plane weights from it at
    * query-build time (inlined as literals on both engines).
    */
  def planeComponent(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L +
      dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
  }

  private def plane(j: Int, dims: Int): Array[Double] =
    Array.tabulate(dims)(c => planeComponent(j, c))

  /** Signature bit j = sign(embedding · plane_j). Fails loudly (not
    * bucket-0 for every row) when the vector length doesn't match
    * `dims` — a silent mismatch would degenerate LSH into one giant
    * bucket and the full quadratic scan it exists to avoid.
    */
  def signature(embedding: Column, nBits: Int, dims: Int): Column = {
    require(nBits >= 1 && nBits <= 63,
      s"nBits must be in [1, 63] (signature is a signed 64-bit long), got $nBits")
    val bits = (0 until nBits).map { j =>
      val p = plane(j, dims)
      val dot = aggregate(
        zip_with(embedding, typedLit(p), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    when(size(embedding) === dims, bits.reduce(_ + _))
      .otherwise(raise_error(concat(
        lit(s"SignLSH: expected $dims-dim vector, got "),
        size(embedding).cast("string"))))
  }

  /** Attach an LSH bucket column; near-dup candidate pairs are rows
    * sharing `bucketCol`. At 100 TB: groupBy bucket, verify in-bucket
    * pairs with the native cosine — candidates ≪ n².
    */
  def bucketize(
      df: DataFrame,
      embeddingCol: String,
      nBits: Int,
      dims: Int,
      bucketCol: String = "lsh_bucket"): DataFrame =
    df.withColumn(bucketCol, signature(col(embeddingCol), nBits, dims))
}
