package graft

/** The spec-side model of the repo's exact-integer contracts, defined
  * once so no test suite can drift from the quantization or the
  * lower-median rank the queries and oracles share (the ShingleModel
  * precedent applied to fixed-point money and medians).
  */
object ExactModel {

  /** `floor(x·100 + 0.5)` — the 2-decimal unscaled-integer quantize. */
  def cents2(x: Double): Long = math.floor(x * 100.0 + 0.5).toLong

  /** `floor(price·(1−disc)·10⁴ + 0.5)` — exact 4-decimal revenue. */
  def revU4(price: Double, disc: Double): Long =
    math.floor(price * (1.0 - disc) * 10000.0 + 0.5).toLong

  /** The LOWER median: the ascending element at rank `(n+1) div 2`. */
  def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((s.length + 1) / 2) - 1)
  }
}
