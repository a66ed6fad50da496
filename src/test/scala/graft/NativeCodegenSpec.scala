package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** The cosine_sim nullability bug class, generalized to the whole native
  * family: every codegen'd expression must compile under
  * [[GenerateMutableProjection]] with STRICT (non-nullable) inputs —
  * the case where a wrong `nullable` declaration makes `nullSafeCodeGen`
  * emit an assignment to a constant `isNull` and Janino rejects the
  * stage (which production masks as a silent interpreter fallback; here
  * generate() throws, so no fallback can hide a regression). Each case
  * also cross-checks one generated value against the interpreted
  * `eval`, so the two paths cannot fork.
  */
class NativeCodegenSpec extends AnyFunSuite {

  private val strictStr = BoundReference(0, StringType, nullable = false)
  private val strictStrArr =
    BoundReference(0, ArrayType(StringType, containsNull = false),
      nullable = false)
  private val strictLongArr =
    BoundReference(0, ArrayType(LongType, containsNull = false),
      nullable = false)

  /** Compile with strict inputs, run both paths, require agreement. */
  private def compileAndCross(expr: Expression, row: InternalRow): Any = {
    val proj = GenerateMutableProjection.generate(Seq(expr))
    val gen = proj(row).get(0, expr.dataType)
    val interp = expr.eval(row)
    (gen, interp) match {
      case (g: ArrayData, i: ArrayData) =>
        assert(g.toLongArray().sameElements(i.toLongArray()),
          s"${expr.prettyName}: codegen and interpreted arrays differ")
      case _ =>
        assert(gen == interp,
          s"${expr.prettyName}: codegen=$gen interpreted=$interp")
    }
    gen
  }

  test("H60 compiles strict and matches interpreted eval") {
    val v = compileAndCross(H60(strictStr),
      InternalRow(UTF8String.fromString("graft")))
    assert(v.asInstanceOf[Long] >= 0L, "60-bit hash must be non-negative")
  }

  test("H60Array compiles strict and matches interpreted eval") {
    compileAndCross(H60Array(strictStrArr),
      InternalRow(ArrayData.toArrayData(
        Array(UTF8String.fromString("a"), UTF8String.fromString("b")))))
  }

  test("MinGramHash compiles strict and matches interpreted eval") {
    val v = compileAndCross(MinGramHash(strictStr, 3, 32),
      InternalRow(UTF8String.fromString("abcdefgh")))
    assert(v.asInstanceOf[Long] != Long.MaxValue, "8 cps must yield windows")
  }

  test("MinHashSig compiles strict and matches interpreted eval") {
    compileAndCross(MinHashSig(strictStrArr, 16),
      InternalRow(ArrayData.toArrayData(
        Array(UTF8String.fromString("sh1"), UTF8String.fromString("sh2")))))
  }

  test("MinHashSigLongs compiles strict and matches interpreted eval") {
    compileAndCross(MinHashSigLongs(strictLongArr, 16),
      InternalRow(ArrayData.toArrayData(Array(7L, 99L, 12345L))))
  }

  test("SimHash64 compiles strict and matches interpreted eval") {
    compileAndCross(SimHash64(strictLongArr),
      InternalRow(ArrayData.toArrayData(Array(1L, 2L, 3L))))
  }

  test("WordShingles60 compiles strict and matches interpreted eval") {
    compileAndCross(WordShingles60(strictStrArr, 3),
      InternalRow(ArrayData.toArrayData(
        (1 to 5).map(i => UTF8String.fromString(s"w$i")).toArray)))
  }

  test("no native except cosine_sim can produce null from non-null input") {
    // the audit behind the cosine_sim fix: these expressions' nullSafeEval
    // bodies are total — evaluating each on valid strict input must give
    // non-null, and their nullable must therefore track the child's
    val cases: Seq[(Expression, InternalRow)] = Seq(
      (H60(strictStr), InternalRow(UTF8String.fromString("x"))),
      (MinGramHash(strictStr, 2, 8), InternalRow(UTF8String.fromString("xy"))),
      (SimHash64(strictLongArr), InternalRow(ArrayData.toArrayData(Array(5L)))),
      (MinHashSigLongs(strictLongArr, 4),
        InternalRow(ArrayData.toArrayData(Array(5L)))))
    for ((e, row) <- cases) {
      assert(!e.nullable, s"${e.prettyName}: strict child must mean strict output")
      assert(e.eval(row) != null, s"${e.prettyName} returned null on valid input")
    }
    // cosine_sim and int_sq_dist are the documented exceptions: null on
    // unequal lengths
    import org.apache.spark.sql.types.{FloatType, LongType}
    val fa = BoundReference(0, ArrayType(FloatType, containsNull = false),
      nullable = false)
    assert(CosineSimilarity(fa, fa).nullable)
    val la = BoundReference(0, ArrayType(LongType, containsNull = false),
      nullable = false)
    assert(graft.functions.IntSqDist(la, la).nullable)
  }
}
