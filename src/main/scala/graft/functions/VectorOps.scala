package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, built entirely from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs,
  * so the expressions stay inside whole-stage codegen and scale linearly
  * over 100 TB of vectors.
  *
  * All arithmetic is double-precision and strictly left-to-right
  * (`aggregate` folds sequentially), which makes results bit-identical to
  * the DuckDB oracle's in-order `sum()` over `unnest`-ed elements.
  */
object VectorOps {

  private def sumArr(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) in double precision. */
  def dot(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(sumArr(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity (HOF composition — reference implementation). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine similarity via the native codegen'd [[CosineSimilarity]]
    * expression — single fused loop, no intermediate arrays; produces
    * bit-identical results to [[cosine]] (same per-accumulator fold
    * order). Preferred in hot paths.
    */
  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Squared euclidean distance (cheaper than sqrt for argmin). */
  def l2Sq(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))

  /** floor(x·scale) int64 quantization of a float/double array column —
    * the exact-arithmetic entry gate of the embedding family (q119/q128
    * discipline). One definition for every quantizing query so the
    * cross-engine contract cannot fork (`KMeans.fitQuantized` spells the
    * same transform internally on its own column names).
    */
  def quantize(a: Column, scale: Long): Column =
    transform(a, x => floor(x.cast("double") * scale).cast("long"))

  /** EXACT int64 squared L2 between two pre-quantized bigint arrays,
    * via the native codegen'd [[IntSqDist]] expression — one fused
    * loop, no intermediate array, identical per-index sequential fold
    * to the `zip_with`+`aggregate` HOF it replaced (so every gated
    * consumer's values are unchanged to the bit). Caller owns the
    * overflow budget (|aᵢ−bᵢ| ≤ m ⇒ result ≤ dims·m²). Single copy for
    * the k-means trainers, q211/q224/q228/q233/q237 and the streaming
    * semantic decontaminator.
    */
  def intSqDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(IntSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
