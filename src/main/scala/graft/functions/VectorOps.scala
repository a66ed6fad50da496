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
}
