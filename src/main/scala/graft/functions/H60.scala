package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit cross-engine content hash — the codegen'd form of
  * `conv(substr(md5(x), 1, 15), 16, 10)` (see [[CrossHash]]).
  *
  * The built-in chain allocates an md5 HEX STRING per row, substrings
  * it, and re-parses the prefix base-16 through `conv`'s generic
  * radix loop. This expression digests the UTF-8 bytes directly and
  * assembles the 60-bit value from the raw digest via
  * [[CrossHash.h60FromDigest]] — the SINGLE copy of the bit layout
  * shared with every other native sketch expression, so the
  * cross-engine contract (DuckDB: `CAST('0x' || substr(md5(x), 1, 15)
  * AS BIGINT)`) cannot fork. Bit-identical to the built-in chain by
  * construction; the oracle SQL is unchanged.
  *
  * Used by [[CrossHash.h60]], which every Column-API consumer calls —
  * the hot paths are per-shingle hashing (q89 contamination, q46
  * MinHash UDAF input) and per-chunk/per-doc fingerprints
  * (q96/q100/q56). md5 here is a content fingerprint, not a security
  * primitive.
  */
case class H60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"h60 requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h60"

  override def nullSafeEval(input: Any): Any =
    H60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.H60.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): H60 =
    copy(child = newChild)
}

/** Element-wise [[H60]] over an array<string> — the codegen'd form of
  * `transform(arr, t -> conv(substr(md5(t), 1, 15), 16, 10))`.
  *
  * Spark's higher-order functions are CodegenFallback: the lambda body
  * runs interpreted per ELEMENT, so a per-token hash inside `transform`
  * pays four interpreted expression nodes plus a hex-string round-trip
  * for every token of every document. This expression is one native
  * call per ROW: a single digest loop over the array, null elements
  * passed through as null (matching `transform`'s null semantics).
  * q22's token-hash projection uses it; the SimHash fold stays in
  * [[SimHash64]].
  */
case class H60Array(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"h60_array requires array<string>, got $t")
  }
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, containsNull = n)
    case _ => ArrayType(LongType, containsNull = true)
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h60_array"

  override def nullSafeEval(input: Any): Any =
    H60Array.compute(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.H60Array.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): H60Array =
    copy(child = newChild)
}

object H60Array {

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("h60_array"),
    new ExpressionInfo(classOf[H60Array].getName, "h60_array"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"h60_array requires exactly 1 argument, got ${exprs.length}")
      H60Array(exprs.head)
    })

  def h60Array(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(H60Array(ColumnBridge.expression(c)))
  }

  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = H60.compute(arr.getUTF8String(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object H60 {

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("h60"),
    new ExpressionInfo(classOf[H60].getName, "h60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"h60 requires exactly 1 argument, got ${exprs.length}")
      H60(exprs.head)
    })

  private[functions] val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** md5 over the column's UTF-8 bytes (exactly what Spark's `md5`
    * hashes for a string column), folded to 60 bits. Called from both
    * interpreted eval and generated code.
    */
  def compute(s: UTF8String): Long = {
    val d = digests.get()
    d.reset()
    CrossHash.h60FromDigest(d.digest(s.getBytes))
  }
}
