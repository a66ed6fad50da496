package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder
import graft.ops.ScaleOps

/** The z-order layout claim, measured: range-writing a table on the
  * Morton key gives every file a TIGHT 2-D bounding box, so min/max
  * file stats prune box predicates on EITHER dimension — a linear sort
  * key only ever prunes its own leading dimension.
  */
class ZOrderLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4)

  /** 256×256 uniform grid, one row per cell. */
  private def grid(): DataFrame = {
    import spark.implicits._
    spark.range(0, 65536).toDF("id")
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
      .withColumn("z", ZOrder.interleave16(col("x"), col("y")))
  }

  /** Files whose (x, y) bounding box intersects the given box — what a
    * stats-aware reader would have to open.
    */
  private def filesIntersecting(dir: String, xLo: Long, xHi: Long,
      yLo: Long, yHi: Long): (Int, Int) = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    val hit = files.count { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      !(r.getLong(1) < xLo || r.getLong(0) > xHi ||
        r.getLong(3) < yLo || r.getLong(2) > yHi)
    }
    (hit, files.length)
  }

  test("z-order layout prunes 2-D boxes where a linear sort cannot") {
    val zDir = Files.createTempDirectory("zorder-layout").toString
    val xDir = Files.createTempDirectory("xsort-layout").toString
    val g = grid()
    ScaleOps.writeRangePartitioned(g, "z", 64, zDir)
    ScaleOps.writeRangePartitioned(g, "x", 64, xDir)

    // y-only box: orthogonal to the x sort, so the linear layout opens
    // (nearly) every file; the z layout's 32×32 tiles skip >= 75%
    val (zHitY, zTotal) = filesIntersecting(zDir, 0, 255, 0, 31)
    val (xHitY, xTotal) = filesIntersecting(xDir, 0, 255, 0, 31)
    assert(zTotal >= 32 && xTotal >= 32, s"want many files: $zTotal, $xTotal")
    assert(xHitY > xTotal * 3 / 4, s"x-sorted should scan ~all files, hit $xHitY/$xTotal")
    assert(zHitY <= zTotal / 4, s"z-sorted should skip >=75%, hit $zHitY/$zTotal")

    // x-only box: both layouts prune (z is no worse than ~2x the linear)
    val (zHitX, _) = filesIntersecting(zDir, 0, 31, 0, 255)
    assert(zHitX <= zTotal / 4, s"z-sorted x-box hit $zHitX/$zTotal")

    // and the z key itself pushes down for z-range scans
    val scan = spark.read.parquet(zDir).filter(col("z") < 1024)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(z), LessThan(z,"),
      s"z predicate did not push down:\n$scan")
  }
}
