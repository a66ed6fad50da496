package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.grid.AscGrid

/** Property tests (SURVEY.md §5.2): random grids → render → parse →
  * explode, checking the structural invariants of the raster→points
  * contract.
  */
class GridPropertySpec extends AnyFunSuite {

  private val NoData = -999

  private case class RawGrid(
      ncols: Int, nrows: Int,
      xll: Double, yll: Double, cell: Double,
      values: Vector[Vector[Int]]) {
    def render: String = {
      val header =
        s"""ncols $ncols
           |nrows $nrows
           |xllcorner $xll
           |yllcorner $yll
           |cellsize $cell
           |NODATA_value $NoData""".stripMargin
      (header +: values.map(_.mkString(" "))).mkString("\n")
    }
  }

  private val gridGen: Gen[RawGrid] = for {
    ncols <- Gen.choose(1, 9)
    nrows <- Gen.choose(1, 9)
    xll <- Gen.choose(-180, 180).map(_ * 1.0)
    yll <- Gen.choose(-90, 90).map(_ * 1.0)
    cell <- Gen.oneOf(0.25, 0.5, 1.0) // binary-exact cellsizes
    values <- Gen.listOfN(nrows,
      Gen.listOfN(ncols, Gen.frequency(
        4 -> Gen.choose(0, 1000),
        1 -> Gen.const(NoData))).map(_.toVector)).map(_.toVector)
  } yield RawGrid(ncols, nrows, xll, yll, cell, values)

  /** Deterministic sampler (scalatestplus isn't on the offline classpath;
    * raw ScalaCheck generators with a fixed seed chain give the same
    * coverage reproducibly).
    */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    var produced = 0
    while (produced < 200) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
    }
  }

  test("parse is the inverse of render") {
    forAll(gridGen) { raw =>
      val g = AscGrid.parse(raw.render)
      assert(g.ncols == raw.ncols && g.nrows == raw.nrows)
      assert(g.xllcorner == raw.xll && g.yllcorner == raw.yll)
      assert(g.cellsize == raw.cell && g.nodata == NoData)
      assert(g.values.map(_.toVector) == raw.values)
    }
  }

  test("explode emits exactly the non-NODATA cells") {
    forAll(gridGen) { raw =>
      val g = AscGrid.parse(raw.render)
      val expected = raw.values.flatten.count(_ != NoData)
      assert(g.explode.size == expected)
    }
  }

  test("exploded coordinates stay inside the grid bounding box") {
    forAll(gridGen) { raw =>
      val g = AscGrid.parse(raw.render)
      g.explode.foreach { p =>
        assert(p.longitude >= g.xllcorner)
        assert(p.longitude <= g.xllcorner + (g.ncols - 1) * g.cellsize)
        assert(p.latitude >= g.yllcorner)
        assert(p.latitude <= g.yllcorner + (g.nrows - 1) * g.cellsize)
      }
    }
  }

  test("explode round-trips: re-pivoting points rebuilds the raster") {
    forAll(gridGen) { raw =>
      val g = AscGrid.parse(raw.render)
      // rebuild a NODATA-filled raster and place every point back by its
      // affine-inverted indices
      val rebuilt = Array.fill(g.nrows, g.ncols)(NoData)
      g.explode.foreach { p =>
        val c = math.round((p.longitude - g.xllcorner) / g.cellsize).toInt
        val r = g.nrows - 1 - math.round((p.latitude - g.yllcorner) / g.cellsize).toInt
        rebuilt(r)(c) = p.radiation
      }
      assert(rebuilt.map(_.toVector).toVector == raw.values)
    }
  }

  test("no two points share coordinates within a grid") {
    forAll(gridGen) { raw =>
      val pts = AscGrid.parse(raw.render).explode.toVector
      val coords = pts.map(p => (p.longitude, p.latitude))
      assert(coords.distinct.size == coords.size)
    }
  }
}
