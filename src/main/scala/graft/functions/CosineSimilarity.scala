package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the codegen'd scale path for E3
  * (SURVEY.md §4 flagged this as the one custom `Expression` worth
  * building if HOF-based codegen proved limiting at the 100 TB design
  * point).
  *
  * Versus the `zip_with`+`aggregate` HOF composition, one fused loop
  * computes dot, |a|² and |b|² in a single pass with no intermediate
  * array allocation — and the generated Java stays inside whole-stage
  * codegen. Accumulation order per accumulator is index-sequential,
  * IDENTICAL to the HOF fold and to the DuckDB oracle's in-order sum, so
  * swapping implementations cannot change results even at the last bit.
  *
  * Null semantics also mirror the HOF composition: a null array input
  * yields null (`nullIntolerant`), and UNEQUAL-LENGTH vectors yield null
  * (as `zip_with` null-padding does) rather than silently scoring a
  * truncated prefix. Null elements inside the arrays are not expected
  * (embedding vectors).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Unequal-length inputs produce null regardless of child nullability, so
  // this expression is ALWAYS nullable. BinaryExpression's default
  // (`left.nullable || right.nullable`) would claim non-nullable for strict
  // schemas, which both lies to the optimizer (IsNull folding) and makes
  // nullSafeCodeGen emit `isNull` as a constant — the `${ev.isNull} = true`
  // branch below then fails Janino compilation and silently drops the whole
  // stage to interpreter mode.
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  double $nx = 0.0;
         |  double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi;
         |    $nx += $xi * $xi;
         |    $ny += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Registration triple for `SparkSessionExtensions.injectFunction` /
    * the session FunctionRegistry: exposes `cosine_sim(a, b)` to SQL.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
      CosineSimilarity(exprs.head, exprs(1))
    })
}
