package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic embedded fixture rasters (see /root/repo/FIXTURES.md F1/F6).
  *
  * The same constants feed BOTH engines of the correctness gate: the Spark
  * side materializes them as DataFrames, and the DuckDB oracle receives them
  * as inline `VALUES` CTEs generated from the identical Scala data — so the
  * two engines provably read the same bytes. All cellsizes are binary-exact
  * doubles (1.0 / 0.5 / 0.25) so affine coordinates are bit-identical across
  * engines.
  *
  * Filename convention per `bom/bom.py:94-107`:
  * `<product>_<radiationtype>_<YYYYMMDD>_<HHMM...>.<ext>` (UTC, minutes
  * dropped, rendered in Australia/Sydney).
  */
object GridFixtures {

  final case class GridFile(name: String, content: String)

  /** F1 from FIXTURES.md — DST (+11) case: UTC 2017-12-31 23:00 →
    * Sydney 2018-01-01 10:00. 12 cells, 4 NODATA.
    */
  val f1: GridFile = GridFile(
    "IDZ00026_radiation_20171231_2300.txt",
    """ncols 4
      |nrows 3
      |xllcorner 112.0
      |yllcorner -44.0
      |cellsize 0.5
      |NODATA_value -999
      |12 15 -999 20
      |7 -999 9 11
      |-999 3 4 -999""".stripMargin)

  /** Non-DST (+10) case (2017-06-15 02:00 UTC → 12:00 same day) with an
    * all-NODATA data row and a non-default NODATA sentinel.
    */
  val f2: GridFile = GridFile(
    "IDZ00026_uv_20170615_0200.txt",
    """ncols 3
      |nrows 2
      |xllcorner 130.0
      |yllcorner -20.0
      |cellsize 0.25
      |NODATA_value -1
      |5 -1 8
      |-1 -1 -1""".stripMargin)

  /** Single-cell grid; filename sits exactly on the 2018 DST-end instant
    * (2018-03-31 16:00 UTC = 02:00 AEST after rollback).
    */
  val f3: GridFile = GridFile(
    "IDZ00026_global_20180331_1600.txt",
    """ncols 1
      |nrows 1
      |xllcorner 145.0
      |yllcorner -38.0
      |cellsize 1.0
      |NODATA_value -999
      |42""".stripMargin)

  /** DST-start boundary (2017-09-30 16:00 UTC = 2017-10-01 03:00 AEDT);
    * includes a legitimate zero value next to NODATA, and a minutes-present
    * time token (1630 → hour 16, minutes dropped per bom/bom.py:102).
    */
  val f4: GridFile = GridFile(
    "IDZ00026_radiation_20170930_1630.txt",
    """ncols 2
      |nrows 2
      |xllcorner 140.0
      |yllcorner -30.0
      |cellsize 0.5
      |NODATA_value -999
      |0 -999
      |17 3""".stripMargin)

  val files: Seq[GridFile] = Seq(f1, f2, f3, f4)

  /** Long-format raw lines `(file_name, line_no, line)` — the F6 shape both
    * engines explode from.
    */
  val lines: Seq[(String, Int, String)] =
    files.flatMap(f => f.content.linesIterator.zipWithIndex.map {
      case (l, i) => (f.name, i, l)
    })

  def linesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    lines.toDF("file_name", "line_no", "line")
  }

  /** DuckDB inline relation of the same lines: `(VALUES (...), ...)`. */
  def linesValuesSql: String =
    lines.map { case (f, i, l) =>
      s"('${f}', $i, '${l.replace("'", "''")}')"
    }.mkString("(VALUES ", ", ", ")")

  /** Filenames for the q16 timezone/partition-key contract — the four grid
    * files plus name-only edge cases (UTC-midnight rollover, mid-range
    * minutes token, extra underscore-free product token).
    */
  val fileNames: Seq[String] = files.map(_.name) ++ Seq(
    "IDZ00026_radiation_20180101_0000.txt", // UTC midnight → Sydney +11 same day 11:00
    "IDZ00026_uv_20171001_1559.txt",        // minutes 59 dropped → hour 15
    "IDZ00026_global_20161231_1400.txt")    // new-year rollover: +11 → 2017-01-01 01:00

  def fileNamesDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fileNames.toDF("file_name")
  }

  def fileNamesValuesSql: String =
    fileNames.map(n => s"('$n')").mkString("(VALUES ", ", ", ")")
}
