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

  /** Exact unscaled 4-decimal line revenue
    * `floor(price·(1−disc)·10⁴ + 0.5)` as a BIGINT column — price and
    * discount are 2-decimal fixed-point, so the product is exactly
    * 4-decimal and the quantization recovers it exactly (identical
    * IEEE op sequence on both engines). Addend ≤ ~1e9 ⇒ BIGINT sums
    * hold to ~9e9 rows/group. ONE spelling shared by every relational
    * pack (and mirrored by [[RevU4Sql]] for the oracles) so the
    * exactness discipline cannot fork per pack.
    */
  def revU4(price: Column, disc: Column): Column =
    floor(price * (lit(1.0) - disc) * lit(10000.0) + lit(0.5)).cast("long")

  /** DuckDB twin of [[revU4]] over the lineitem column names. */
  val RevU4Sql: String =
    "CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)"

  /** Exact sum of a fixed-point double expression with `scale` decimal
    * digits, emitted as a bit-identical double.
    *
    * Both preconditions are ENFORCED, not assumed (ADVICE r3 — a future
    * corpus would otherwise silently produce off-by-one-ULP results):
    * a negative addend raises per-row (floor(+0.5) rounds half toward
    * +∞, which is only half-away-from-zero — the cross-engine-stable
    * direction — for non-negative x), and a group sum at or beyond 2^53
    * raises at the group level (the long→double conversion stops being
    * exact there). Both guards live in lazy CASE branches: the hot path
    * stays codegen'd integer adds, and the oracle twin needs no guard —
    * valid data is unaffected and invalid data fails loudly instead of
    * hash-mismatching.
    */
  def sumFixed(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    val addend = when(c < 0, raise_error(concat(
      lit(s"sumFixed: negative addend "), c.cast("string"),
      lit(" — floor(+0.5) quantization requires non-negative inputs"))))
      .otherwise(floor(c * lit(f) + lit(0.5)).cast("long"))
    val s = sum(addend)
    when(abs(s) < lit(1L << 53), s.cast("double") / lit(f))
      .otherwise(raise_error(concat(
        lit("sumFixed: group sum "), s.cast("string"),
        lit(s" exceeds 2^53 — long→double conversion no longer exact; " +
          "pre-aggregate per partition or widen to two-level sums"))))
      .cast("double")
  }

  /** DuckDB twin of [[sumFixed]] — keep the op sequence in lockstep. */
  def sumFixedSql(expr: String, scale: Int): String = {
    val f = "1" + "0" * scale
    s"CAST(sum(CAST(floor(($expr) * $f + 0.5) AS BIGINT)) AS DOUBLE) / $f"
  }
}
