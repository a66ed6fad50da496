package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.grid.{AscGrid, GridFixtures, GridPoint}

/** Pure (no-Spark) tests of the AscGrid core against FIXTURES.md F1. */
class AscGridSpec extends AnyFunSuite {

  test("F1 parses header fields") {
    val g = AscGrid.parse(GridFixtures.f1.content)
    assert(g.ncols == 4 && g.nrows == 3)
    assert(g.xllcorner == 112.0 && g.yllcorner == -44.0)
    assert(g.cellsize == 0.5 && g.nodata == -999)
  }

  test("F1 explodes to the 8 documented points, NODATA skipped") {
    val g = AscGrid.parse(GridFixtures.f1.content)
    val pts = g.explode.toVector
    val expected = Vector(
      GridPoint(112.0, -43.0, 12),
      GridPoint(112.5, -43.0, 15),
      GridPoint(113.5, -43.0, 20),
      GridPoint(112.0, -43.5, 7),
      GridPoint(113.0, -43.5, 9),
      GridPoint(113.5, -43.5, 11),
      GridPoint(112.5, -44.0, 3),
      GridPoint(113.0, -44.0, 4))
    assert(pts == expected)
  }

  test("all-NODATA row contributes nothing but coordinates stay aligned") {
    val g = AscGrid.parse(GridFixtures.f2.content)
    val pts = g.explode.toVector
    assert(pts == Vector(
      GridPoint(130.0, -19.75, 5),
      GridPoint(130.5, -19.75, 8)))
  }

  test("single-cell grid sits on the ll corner") {
    val g = AscGrid.parse(GridFixtures.f3.content)
    assert(g.explode.toVector == Vector(GridPoint(145.0, -38.0, 42)))
  }

  test("zero is a legitimate value, distinct from NODATA") {
    val g = AscGrid.parse(GridFixtures.f4.content)
    assert(g.explode.toVector.map(_.radiation) == Vector(0, 17, 3))
  }

  test("filename metadata: DST +11 (F1, FIXTURES.md example)") {
    val m = AscGrid.parseFileName("IDZ00026_radiation_20171231_2300.txt")
    assert(m.radiationType == "radiation")
    assert(m.localDateTime == "2018-01-01 10:00")
    assert((m.year, m.month, m.day, m.hour) == ((2018, 1, 1, 10)))
  }

  test("filename metadata: non-DST +10") {
    val m = AscGrid.parseFileName("IDZ00026_uv_20170615_0200.txt")
    assert(m.localDateTime == "2017-06-15 12:00")
  }

  test("filename metadata: minutes are discarded (bom/bom.py:102)") {
    val m = AscGrid.parseFileName("IDZ00026_radiation_20170930_1630.txt")
    // 16:00 UTC (not 16:30): DST starts 2017-10-01 02:00 Sydney → +11
    assert(m.localDateTime == "2017-10-01 03:00")
  }

  test("filename metadata: path prefixes are ignored") {
    val m = AscGrid.parseFileName("/data/in/IDZ00026_radiation_20171231_2300.txt")
    assert(m.baseName == "IDZ00026_radiation_20171231_2300")
  }

  test("cell count minus nodata equals exploded size on all fixtures") {
    GridFixtures.files.foreach { f =>
      val g = AscGrid.parse(f.content)
      val nodataCells = g.values.map(_.count(_ == g.nodata)).sum
      assert(g.explode.size == g.cellCount - nodataCells, f.name)
    }
  }
}
