package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-LSH (random-hyperplane) bucketing for embedding vectors — the
  * scale path behind cosine near-dup detection (q42): two vectors with
  * cosine similarity `s` agree on each hyperplane sign with probability
  * `1 - arccos(s)/π`, so near-duplicates collide in signature buckets
  * and the quadratic all-pairs scoring runs only within buckets.
  *
  * Hyperplanes are DETERMINISTIC: component `c` of plane `j` derives
  * from the [[CrossHash]] LCG family, so signatures are reproducible
  * across runs and engines — the same pinned-randomness principle as the
  * MinHash coefficients.
  */
object SignLSH {

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private[functions] def planeComponent(plane: Int, dim: Int): Double = {
    val x = (1103515245L * (plane * 8191L + dim) + 12345L) % 2000003L
    (x.toDouble / 2000003.0) * 2.0 - 1.0
  }

  private def plane(j: Int, dims: Int): Array[Double] =
    Array.tabulate(dims)(c => planeComponent(j, c))

  /** Signature bit j = sign(embedding · plane_j). */
  def signature(embedding: Column, nBits: Int, dims: Int): Column = {
    val bits = (0 until nBits).map { j =>
      val p = plane(j, dims)
      val dot = aggregate(
        zip_with(embedding, typedLit(p), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
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
