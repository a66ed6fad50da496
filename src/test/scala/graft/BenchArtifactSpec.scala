package graft

import java.nio.file.Files

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Guard on the bench artifacts this repo commits (BENCH_LOCAL_r*.json,
  * BENCH_SF*_r*.json): each must parse as JSON whose `queries` map is
  * non-empty and whose `value` total is consistent with the per-query
  * medians. Every driver-side BENCH_r*.json through round 11 carried
  * "parsed": null — the signal lived ONLY in these local artifacts, so
  * an emitter regression that truncated or malformed one would
  * silently erase the round's performance evidence. (The driver-side
  * parse itself was failing on sbt's "[info] " line prefix — fixed in
  * build.sbt via run/outputStrategy := StdoutOutput — but the local
  * artifacts stay the canonical per-query record either way.)
  */
class BenchArtifactSpec extends AnyFunSuite {

  private val artifacts = Option(new java.io.File(".").listFiles()).toSeq
    .flatten
    .filter(_.getName.matches("BENCH_(LOCAL|SF\\d+)_r\\d+\\.json"))
    .sortBy(_.getName)

  test("bench artifacts exist (this spec runs from the repo root)") {
    assert(artifacts.nonEmpty,
      "no BENCH_LOCAL/SF artifacts found — wrong cwd or emitter broken")
  }

  test("every bench artifact has a non-empty queries map and a " +
    "consistent total") {
    artifacts.foreach { f =>
      val json = JsonMethods.parse(Files.readString(f.toPath))
      val queries = (json \ "queries") match {
        case JObject(fields) => fields
        case other => fail(s"${f.getName}: queries is ${other.getClass}")
      }
      assert(queries.nonEmpty, s"${f.getName}: empty queries map")
      val qsum = queries.map {
        case (k, JDouble(v)) => v
        case (k, JInt(v)) => v.toDouble
        case (k, JLong(v)) => v.toDouble
        case (k, other) => fail(s"${f.getName}: $k is non-numeric $other")
      }.sum
      val total = (json \ "value") match {
        case JDouble(v) => v
        case JInt(v) => v.toDouble
        case other => fail(s"${f.getName}: value is $other")
      }
      // medians don't sum to the total exactly only when a run was
      // killed mid-write; allow float noise, catch truncation
      assert(math.abs(qsum - total) < 0.01 * math.max(1.0, total),
        s"${f.getName}: per-query sum $qsum != total $total")
      (json \ "errors") match {
        case JObject(errs) => assert(errs.isEmpty,
          s"${f.getName}: committed artifact carries errors: " +
            errs.map(_._1).mkString(","))
        case _ => // totals-only schema has no errors object
      }
    }
  }
}
