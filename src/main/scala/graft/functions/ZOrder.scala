package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-order) encoding of two 16-bit coordinates into one 32-bit
  * key, built ENTIRELY from built-in bitwise expressions — the whole
  * computation stays inside whole-stage codegen with no custom
  * Expression and has an exact SQL twin for the DuckDB oracle.
  *
  * Why it matters at 100 TB: sorting/range-partitioning a table by
  * `interleave16(x, y)` clusters rows so that every file's (x, y)
  * bounding box is small. A 2-D box predicate then skips the vast
  * majority of files/row-groups on min/max stats alone — multi-
  * dimensional pruning from a ONE-dimensional sort key, which is
  * exactly what a `repartitionByRange` write gives for free
  * ([[graft.ops.ScaleOps.writeRangePartitioned]]; proof in
  * ZOrderLayoutSpec).
  *
  * Bit-spreading uses the classic public mask sequence (Bit Twiddling
  * Hacks): x | x<<8 & 0x00FF00FF, then 4/2/1 with the matching masks.
  */
object ZOrder {

  /** Spread the low 16 bits of c into the even bit positions of a
    * 32-bit value (all arithmetic in non-negative longs).
    */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** z = bits of x on even positions, bits of y on odd positions.
    * Inputs are masked to their low 16 bits; the result is in
    * [0, 2^32) as a long.
    */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The identical computation as DuckDB SQL (expression text), for
    * oracle twins. `expr` must be a non-negative BIGINT expression.
    */
  def spread16Sql(expr: String): String = {
    val x0 = s"(($expr) & 65535)"
    val x1 = s"(($x0 | ($x0 << 8)) & 16711935)"
    val x2 = s"(($x1 | ($x1 << 4)) & 252645135)"
    val x3 = s"(($x2 | ($x2 << 2)) & 858993459)"
    s"(($x3 | ($x3 << 1)) & 1431655765)"
  }

  def interleave16Sql(xExpr: String, yExpr: String): String =
    s"(${spread16Sql(xExpr)} | (${spread16Sql(yExpr)} << 1))"
}
