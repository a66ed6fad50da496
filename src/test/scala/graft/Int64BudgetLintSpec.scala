package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source lint enforcing the repo's int64-budget discipline (ADVICE
  * r9/r10): any squared-sum moment — `sum(x * x)` in an oracle or
  * `sum(col * col)` in Spark code — over corpus-scale BIGINTs can wrap
  * silently at 2⁶³, so every such site must carry NEARBY documentation
  * of why it can't (a stated magnitude bound, an int64/2⁵³/2⁶³ budget
  * line) or be computed in DECIMAL/HUGEINT (the q252 fix). The rule
  * lived only in scaladoc convention before round 11; this spec makes
  * round-12 widening unable to re-introduce a q252-class overflow
  * without failing the build.
  */
class Int64BudgetLintSpec extends AnyFunSuite {

  /** sum over ANY product of two identifiers: sum(x * x) second
    * moments AND cross-moments like sum(x * y) / sum(freq * ntok) —
    * the q163-class covariance/dot shapes carry the identical wrap
    * risk the self-product rule alone missed (ADVICE r11).
    */
  private val SumSquare =
    """(?i)sum\s*\(\s*([A-Za-z_][A-Za-z0-9_.]*|col\("[^"]+"\))\s*\*\s*([A-Za-z_][A-Za-z0-9_.]*|col\("[^"]+"\))\s*\)""".r

  /** Evidence that the site thought about magnitude: a DIGIT-BEARING
    * budget (2^NN / 10^NN / superscript powers), an int64/overflow
    * statement, or an exact-decimal escape hatch. Deliberately NOT
    * generic words like "bound"/"exact"/"budget" alone — those matched
    * anywhere in a 150-line window and suppressed real findings
    * (ADVICE r11).
    */
  private val Marker =
    ("""(?i)(int64|hugeint|decimal|overflow|2\^[0-9]{1,2}|""" +
      """2[⁰¹²³⁴⁵⁶⁷⁸⁹]{1,2}|10\^[0-9]{1,2}|10[⁰¹²³⁴⁵⁶⁷⁸⁹]{1,2}|·\s*10)""").r.unanchored

  /** Lines of context above a match inside which the documentation
    * must appear — generous enough to reach the query's scaladoc,
    * small enough that a doc for query A can't excuse query B two
    * hundred lines later.
    */
  private val Window = 150

  private def offenders(lines: Vector[String]): Seq[Int] =
    lines.zipWithIndex.collect {
      case (line, i)
        if SumSquare.findFirstIn(line).isDefined &&
          !lines.slice(math.max(0, i - Window), i + 3)
            .exists(l => Marker.findFirstIn(l).isDefined) => i + 1
    }

  test("detector flags an undocumented corpus-scale sum(x*x)") {
    val bad = Vector(
      "object Q999 {",
      "  val oracle = \"SELECT lang, sum(sz * sz) AS m2 FROM docs GROUP BY 1\"",
      "}")
    assert(offenders(bad) == Seq(2))
    // Spark Column form is caught too
    val badCol = Vector("""df.agg(sum(col("n_chars") * col("n_chars")))""")
    assert(offenders(badCol) == Seq(1))
    // cross-moments (covariance/dot shapes) are caught too (ADVICE r11)
    val badCross = Vector(
      "  val oracle = \"SELECT sum(x * y) AS sxy FROM pairs\"",
      """df.agg(sum(col("freq") * col("ntok")))""")
    assert(offenders(badCross) == Seq(1, 2))
    // and the generic marker words no longer excuse a site
    val vague = Vector(
      "  // the bound is exact by construction (budget honored)",
      "  val oracle = \"SELECT sum(x * y) AS sxy FROM pairs\"")
    assert(offenders(vague) == Seq(2))
  }

  test("detector accepts a documented or DECIMAL-escaped site") {
    val documented = Vector(
      "  // Int64 budget: sz < 2^20 and n < 2^22 keep n*max(sz)^2 < 2^62",
      "  val oracle = \"SELECT sum(sz * sz) AS m2 FROM docs\"")
    assert(offenders(documented).isEmpty)
    val decimal = Vector(
      "  // moment in DECIMAL(38,0) after the q252 review",
      "  val oracle = \"SELECT CAST(sum(sz * sz) AS DECIMAL(38,0)) FROM d\"")
    assert(offenders(decimal).isEmpty)
  }

  test("every squared-sum in graft.queries documents its int64 budget") {
    val dir = Paths.get("src/main/scala/graft/queries")
    val files: Seq[Path] = Files.list(dir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".scala")).sortBy(_.toString)
    assert(files.nonEmpty, s"no sources under $dir — lint ran from the wrong cwd?")
    val bad = files.flatMap { f =>
      val lines = Files.readAllLines(f).asScala.toVector
      offenders(lines).map(ln => s"$f:$ln  ${lines(ln - 1).trim.take(90)}")
    }
    assert(bad.isEmpty,
      "squared-sum sites missing an int64-budget/DECIMAL note within " +
        s"$Window lines:\n  " + bad.mkString("\n  "))
  }
}
