package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, cross-engine-deterministic sums of fixed-point
  * double columns.
  *
  * Why this exists: double summation is order-dependent in the last ULP
  * and each engine sums groups in its own parallel order. When the true
  * group total (or mean) lands mathematically ON a rounding boundary —
  * common when the data itself is fixed-point, e.g. 2-decimal prices or
  * 4-decimal price×discount products — the two engines' results can
  * straddle the boundary, and `round()` itself resolves ties differently
  * per engine even on identical inputs (Spark HALF_UP on the exact
  * binary expansion vs DuckDB's multiply-first). Observed as q20 hash
  * flakes at sf0.1.
  *
  * The fix: quantize each addend to its fixed-point UNSCALED integer —
  * `floor(x·10^s + 0.5)` is the same IEEE op sequence on both engines,
  * and a tie in the floor would need `x·10^s` to be a dyadic rational
  * ending in .5, which the quantization error (≪ 0.5) can't produce —
  * then sum as BIGINT (exact, order-independent, whole-stage-codegen
  * integer adds; a DECIMAL sum with precision > 18 drops to the slow
  * BigDecimal path, measured 3.6× slower on q12). The final
  * long→double conversion is exact while |sum| < 2^53, and the single
  * division by 10^s is the same IEEE op on both engines — so the
  * emitted double is bit-identical cross-engine and needs NO rounding.
  *
  * Overflow headroom: with 4-decimal revenue products (unscaled ≤ 1e9
  * per row) the BIGINT sum holds ~9e9 rows per group; the 2^53
  * exact-conversion bound is reached first, at ~9e6 rows per group of
  * ~1e5-magnitude addends — scale factors beyond that should aggregate
  * per-partition first or widen to two-level sums.
  */
object Exact {

  /** Exact sum of a fixed-point double expression with `scale` decimal
    * digits, emitted as a bit-identical double. Non-negative inputs
    * assumed (floor(+0.5) rounds half toward +∞).
    */
  def sumFixed(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(floor(c * lit(f) + lit(0.5)).cast("long")).cast("double") / lit(f)
  }

  /** DuckDB twin of [[sumFixed]] — keep the op sequence in lockstep. */
  def sumFixedSql(expr: String, scale: Int): String = {
    val f = "1" + "0" * scale
    s"CAST(sum(CAST(floor(($expr) * $f + 0.5) AS BIGINT)) AS DOUBLE) / $f"
  }
}
