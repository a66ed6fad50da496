package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.grid.AscGrid

/** Failure-mode contract of the pure parser: malformed inputs fail with
  * actionable messages (these are what the quarantine sink records).
  */
class AscGridErrorSpec extends AnyFunSuite {

  test("too few header lines") {
    val e = intercept[IllegalArgumentException](AscGrid.parse("ncols 2\nnrows 1"))
    assert(e.getMessage.contains("6 header lines"))
  }

  test("malformed header line (no value token)") {
    val e = intercept[IllegalArgumentException](AscGrid.parse(
      "ncols\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1\nNODATA_value -999\n5"))
    assert(e.getMessage.contains("malformed header line"))
  }

  test("non-numeric header value") {
    intercept[NumberFormatException](AscGrid.parse(
      "ncols x\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1\nNODATA_value -999\n5"))
  }

  test("row with wrong cell count") {
    val e = intercept[IllegalArgumentException](AscGrid.parse(
      "ncols 3\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1\nNODATA_value -999\n5 6"))
    assert(e.getMessage.contains("expected 3 cells"))
  }

  test("missing data rows") {
    intercept[Exception](AscGrid.parse(
      "ncols 1\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\nNODATA_value -999\n5"))
  }

  test("non-integer cell value") {
    intercept[NumberFormatException](AscGrid.parse(
      "ncols 1\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1\nNODATA_value -999\n5.5"))
  }

  test("filename without enough underscore tokens") {
    val e = intercept[IllegalArgumentException](
      AscGrid.parseFileName("badname.txt"))
    assert(e.getMessage.contains("metadata"))
  }

  test("filename with unparseable date") {
    intercept[Exception](AscGrid.parseFileName("IDZ_rad_notadate_1200.txt"))
  }
}
