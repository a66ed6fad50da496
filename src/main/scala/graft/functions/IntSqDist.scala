package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for EXACT int64 squared L2 distance over
  * two `array<bigint>` columns — the codegen'd hot path of the
  * integer-exact vector family (the [[CosineSimilarity]] lesson applied
  * to the quantized side): the k-means trainers assign by this distance
  * n·√k times per round, and the IVF/silhouette consumers (q211/q224/
  * q233) rank panels against the corpus-proportional codebook with it.
  * The `zip_with`+`aggregate` HOF composition this replaces is NOT
  * codegen-friendly (lambda variables, one intermediate 64-element
  * array allocated per pair) — the sf10 rung measured the HOF form of
  * the q233 panel×k pass at 17 s where this loop is sub-second.
  *
  * Arithmetic is IDENTICAL to the HOF fold: per-index (xᵢ−yᵢ)²
  * accumulated sequentially in Java long (wrapping like non-ANSI Spark
  * long arithmetic — callers own the 2⁶³/2⁵³ budgets exactly as
  * before). Unequal-length inputs yield null (as zip_with null-padding
  * does), and so does any null ELEMENT — matching the HOF fold, where a
  * null operand nulls the whole `aggregate` (quantized vectors never
  * carry null elements, but the semantics must not fork if one does:
  * `getLong` on a null slot reads an undefined value).
  */
case class IntSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_sq_dist requires (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // unequal-length inputs produce null regardless of child nullability
  // (see CosineSimilarity.nullable for why the default would mis-codegen)
  override def nullable: Boolean = true
  override def prettyName: String = "int_sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntSqDist =
    copy(left = newLeft, right = newRight)
}

object IntSqDist {
  /** Registration triple for `SparkSessionExtensions.injectFunction` /
    * the session FunctionRegistry: exposes `int_sq_dist(a, b)` to SQL.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("int_sq_dist"),
    new ExpressionInfo(classOf[IntSqDist].getName, "int_sq_dist"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"int_sq_dist requires exactly 2 arguments, got ${exprs.length}")
      IntSqDist(exprs.head, exprs(1))
    })
}
