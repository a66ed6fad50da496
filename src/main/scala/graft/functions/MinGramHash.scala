package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-window min-fingerprint: the minimum 60-bit content hash
  * (`CrossHash.h60` semantics — first 15 hex chars of md5, parsed base 16)
  * over every `k`-codepoint window of the first `cap` codepoints of a
  * string.
  *
  * Replaces the q28 HOF formulation
  * `aggregate(transform(sequence(...), i -> conv(substr(md5(substr(text,i,k)),1,15),16,10)), ...)`
  * which materializes ~cap substring copies, md5 hex strings, and a long
  * array per row through interpreted lambda evaluation. This expression
  * makes one codegen'd pass with a reused thread-local digest and no hex
  * round-trip (the 60-bit value is assembled from the raw digest bytes),
  * producing bit-identical output by construction — the DuckDB oracle is
  * unchanged.
  *
  * Windowing is by Unicode CODE POINT, matching both Spark's and DuckDB's
  * `substr`/`length` semantics on the mixed-script corpus. If the string
  * has fewer than `k` codepoints there is no window and the fold identity
  * `Long.MaxValue` is returned (callers filter `length(text) >= k`, as
  * q28 does).
  */
case class MinGramHash(child: Expression, k: Int, cap: Int)
    extends UnaryExpression {

  require(k >= 1 && cap >= k, s"need 1 <= k <= cap, got k=$k cap=$cap")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"min_gram_hash requires string, got $t")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "min_gram_hash"

  override def nullSafeEval(input: Any): Any =
    MinGramHash.compute(input.asInstanceOf[UTF8String], k, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinGramHash.compute($a, $k, $cap);")

  override protected def withNewChildInternal(newChild: Expression): MinGramHash =
    copy(child = newChild)
}

object MinGramHash {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** One pass over the string: min of h60(md5(window)) for each
    * k-codepoint window within the first `cap` codepoints. Called from
    * both interpreted eval and generated code.
    */
  def compute(text: UTF8String, k: Int, cap: Int): Long = {
    val s = text.toString
    // char offset of each codepoint boundary, up to cap codepoints
    val charLen = s.length
    var cp = 0
    var ci = 0
    val offsets = new Array[Int](cap + 1)
    while (ci < charLen && cp < cap) {
      offsets(cp) = ci
      ci += Character.charCount(s.codePointAt(ci))
      cp += 1
    }
    offsets(cp) = ci
    val n = cp // codepoints considered (<= cap)
    var min = Long.MaxValue
    val md = digests.get()
    var i = 0
    while (i <= n - k) {
      val gram = s.substring(offsets(i), offsets(i + k))
      md.reset()
      val v = CrossHash.h60FromDigest(
        md.digest(gram.getBytes(StandardCharsets.UTF_8)))
      if (v < min) min = v
      i += 1
    }
    min
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("min_gram_hash"),
    new ExpressionInfo(classOf[MinGramHash].getName, "min_gram_hash"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3,
        s"min_gram_hash(text, k, cap) requires 3 arguments, got ${exprs.length}")
      val ints = exprs.tail.map {
        case Literal(v: Int, IntegerType) => v
        case e => throw new IllegalArgumentException(
          s"min_gram_hash k/cap must be integer literals, got $e")
      }
      MinGramHash(exprs.head, ints(0), ints(1))
    })

  def minGramHash(c: Column, k: Int, cap: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MinGramHash(ColumnBridge.expression(c), k, cap))
  }
}
