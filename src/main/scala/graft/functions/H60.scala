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

object H60 {

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("h60"),
    new ExpressionInfo(classOf[H60].getName, "h60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1,
        s"h60 requires exactly 1 argument, got ${exprs.length}")
      H60(exprs.head)
    })

  private val digests: ThreadLocal[MessageDigest] =
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
