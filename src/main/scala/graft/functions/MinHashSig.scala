package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for an array of shingle strings, the
  * `n`-long array of `min_s universal_j(h60(s))` — exactly
  * [[CrossHash.h60]] (first 15 hex chars of md5, base 16) composed with
  * [[CrossHash.universal]] (`(a_j*(h%P)+b_j)%P`, pinned coefficient
  * tables), so results are bit-identical to the explode → 16×min
  * group-by formulation and to the DuckDB oracle.
  *
  * The declarative spelling pushes every (doc, shingle) pair through
  * Generate + HashAggregate (~300 rows/doc of interpreter+agg machinery
  * plus an md5 hex round-trip each). This expression computes the whole
  * signature in one codegen'd pass per document: no explode, no
  * aggregation, no shuffle — the signature stage becomes a narrow
  * projection that scales at scan speed.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= CrossHash.hashA.length,
    s"numHashes must be in [1, ${CrossHash.hashA.length}], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSig.compute($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** One pass: for each shingle, h60(md5 bytes) once, then n universal
    * hashes folded into running minimums. Null shingle elements are
    * skipped (cannot occur in q21's distinct non-null input, but the
    * expression stays total).
    */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val P = CrossHash.P
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digests.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        md.reset()
        // UTF8String.getBytes IS the UTF-8 encoding — no String
        // round-trip needed before digesting
        val h = CrossHash.h60FromDigest(md.digest(s.getBytes))
        val hp = h % P
        var k = 0
        while (k < numHashes) {
          val u = (CrossHash.hashA(k) * hp + CrossHash.hashB(k)) % P
          if (u < mins(k)) mins(k) = u
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"minhash_sig(shingles, n) requires 2 arguments, got ${exprs.length}")
      val n = exprs(1) match {
        case Literal(v: Int, IntegerType) => v
        case e => throw new IllegalArgumentException(
          s"minhash_sig n must be an integer literal, got $e")
      }
      MinHashSig(exprs.head, n)
    })

  def minhashSig(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), n))
  }

  /** The universal-hash min-fold over PRE-COMPUTED 60-bit hashes (the
    * [[WordShingles60]] output) — skips the digest entirely. Duplicate
    * hashes cannot change any minimum, so feeding the non-distinct
    * window stream produces the same signature as the distinct shingle
    * set did.
    */
  def computeFromHashes(hashes: ArrayData, numHashes: Int): ArrayData = {
    val P = CrossHash.P
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val hp = hashes.getLong(i) % P
        var k = 0
        while (k < numHashes) {
          val u = (CrossHash.hashA(k) * hp + CrossHash.hashB(k)) % P
          if (u < mins(k)) mins(k) = u
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhashSigLongs(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinHashSigLongs(ColumnBridge.expression(c), n))
  }
}

/** [[MinHashSig]] over an array<long> of pre-computed 60-bit hashes —
  * same pinned universal-hash family, no digest. Composed with
  * [[WordShingles60]] it makes the whole signature stage
  * (shingle → hash → n-way min-fold) native with zero intermediate
  * strings: q21's formulation.
  */
case class MinHashSigLongs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= CrossHash.hashA.length,
    s"numHashes must be in [1, ${CrossHash.hashA.length}], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_longs requires array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig_longs"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.computeFromHashes(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSig.computeFromHashes($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigLongs =
    copy(child = newChild)
}

object MinHashSigLongs {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig_longs"),
    new ExpressionInfo(classOf[MinHashSigLongs].getName, "minhash_sig_longs"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"minhash_sig_longs(hashes, n) requires 2 arguments, got ${exprs.length}")
      val n = exprs(1) match {
        case Literal(v: Int, IntegerType) => v
        case e => throw new IllegalArgumentException(
          s"minhash_sig_longs n must be an integer literal, got $e")
      }
      MinHashSigLongs(exprs.head, n)
    })
}
