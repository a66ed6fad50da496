package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native word-shingle hashing: for a token array, the array of 60-bit
  * content hashes of every `k`-token window — element i is
  * `h60(concat_ws(' ', toks[i], ..., toks[i+k-1]))`, bit-identical to
  * the HOF spelling
  * `transform(sequence(0, size(toks)-k), i -> concat_ws(' ', ...))`
  * followed by per-shingle [[H60]].
  *
  * The HOF spelling is CodegenFallback: per WINDOW it runs an
  * interpreted lambda (k array getItems + a concat_ws allocation),
  * then the hash still has to digest the built string. This expression
  * encodes each token's UTF-8 bytes ONCE per row and streams
  * bytes + 0x20 separators straight into a reused digest per window —
  * no shingle string ever exists. Null tokens are skipped exactly like
  * `concat_ws` skips them (they cannot occur after the standard
  * `filter(split(...))` projection, but the expression stays total).
  * Fewer than `k` tokens → empty array (callers filter
  * `size(toks) >= k`, as q21/q46/q89 do).
  *
  * Downstream consumers dedup with `array_distinct` over the HASHES
  * where they previously deduped shingle strings: under a 60-bit
  * collision the hash-level distinct collapses earlier, but every
  * gated consumer (min-fold signatures, `count(DISTINCT h)`,
  * `DISTINCT h` train sets) is invariant to that collapse, so results
  * are unchanged — see the equivalence spec.
  */
case class WordShingles60(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, s"need k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles60 requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles60"

  override def nullSafeEval(input: Any): Any =
    WordShingles60.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordShingles60.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles60 =
    copy(child = newChild)
}

object WordShingles60 {

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_shingles60"),
    new ExpressionInfo(classOf[WordShingles60].getName, "word_shingles60"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"word_shingles60(toks, k) requires 2 arguments, got ${exprs.length}")
      val k = exprs(1) match {
        case Literal(v: Int, IntegerType) => v
        case e => throw new IllegalArgumentException(
          s"word_shingles60 k must be an integer literal, got $e")
      }
      WordShingles60(exprs.head, k)
    })

  def wordShingles60(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(WordShingles60(ColumnBridge.expression(c), k))
  }

  private val Space = ' '.toByte

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // encode each token once; windows then stream cached bytes
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) bytes(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = H60.digests.get()
    val out = new Array[Any](n - k + 1)
    var s = 0
    while (s <= n - k) {
      md.reset()
      var first = true
      var j = 0
      while (j < k) {
        val b = bytes(s + j)
        if (b != null) { // concat_ws semantics: nulls are skipped
          if (!first) md.update(Space)
          md.update(b)
          first = false
        }
        j += 1
      }
      out(s) = CrossHash.h60FromDigest(md.digest())
      s += 1
    }
    new GenericArrayData(out)
  }
}
