package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * Sketch-style operators (MinHash, SimHash, fingerprinting) need a hash
  * that produces IDENTICAL values in Spark and in the DuckDB oracle.
  * Neither engine's native `hash()` qualifies (different algorithms), but
  * both expose md5 over UTF-8 bytes. We take the first 15 hex chars
  * (60 bits — fits a signed 64-bit int with headroom) and parse them as an
  * integer:
  *
  *   Spark : conv(substr(md5(x), 1, 15), 16, 10) :: BIGINT
  *   DuckDB: CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
  *
  * md5 here is a content fingerprint, not a security primitive. All
  * expressions are built-in (codegen'd); no UDFs.
  */
object CrossHash {

  /** Large prime modulus for the universal-hash family. */
  val P: Long = 1000000007L

  /** 60-bit integer hash of a string column, identical across engines.
    * Since round 6 this routes through the native [[H60]] expression —
    * same md5, no hex-string round-trip, one codegen'd call — which is
    * bit-identical to the documented built-in chain
    * `conv(substr(md5(x), 1, 15), 16, 10)` by construction.
    */
  def h60(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(H60(ColumnBridge.expression(c)))
  }

  /** The same 60 bits assembled from a raw md5 digest: bytes 0-6 in
    * full plus the high nibble of byte 7 ≡ the first 15 hex chars
    * parsed base 16. THE single copy of the bit layout — every native
    * expression (MinGramHash, MinHashSig) must go through this so the
    * cross-engine contract can never fork.
    */
  def h60FromDigest(d: Array[Byte]): Long = {
    var v = 0L
    var j = 0
    while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** DuckDB twin of [[h60]] as a SQL fragment. */
  def h60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** The j-th universal hash `(a_j * (h % P) + b_j) % P` of a
    * pre-computed 60-bit hash. `h % P < 2^30`, `a_j < P < 2^30` → the
    * product stays well inside 64 bits.
    */
  def universal(h: Column, j: Int): Column =
    (lit(hashA(j)) * (h % P) + lit(hashB(j))) % P

  def universalSql(hExpr: String, j: Int): String =
    s"(${hashA(j)} * (($hExpr) % $P) + ${hashB(j)}) % $P"

  /** Fixed LCG-derived coefficient tables — both engines consume these
    * exact literals, so the hash family is pinned by construction.
    */
  val hashA: IndexedSeq[Long] =
    IndexedSeq.tabulate(32)(j => (1103515245L * (j + 1) + 12345L) % (P - 2) + 1)
  val hashB: IndexedSeq[Long] =
    IndexedSeq.tabulate(32)(j => (69069L * (j + 7) + 362437L) % P)
}
