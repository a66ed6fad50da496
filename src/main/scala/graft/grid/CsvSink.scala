package graft.grid

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Reference-exact CSV serving sink (O8/O9, `bom/bom.py:28-32,111,153-155`):
  * one CSV object per input grid file, named
  * `<serving>/year=Y/month=M/day=D/hour=H/<base>.csv`, with the header row
  * `Date,RadiationType,Longitude,Latitude,Radiation` and Python-`str()`
  * value rendering (`112.0`, `-43.5` — Scala `Double.toString` matches for
  * the affine-grid domain).
  *
  * This sink exists for byte-level parity with the reference's layout; the
  * parquet path ([[GridReader.writePartitioned]]) is the performant default
  * (SURVEY.md §1.5 — the reference's CSV header is a latent bug for
  * header-unaware readers).
  *
  * The partitioned-parquet path scales; this one intentionally mirrors the
  * reference's one-object-per-file model, so its unit of work is the file
  * too: render on executors via `foreachPartition`, write through the
  * task-local Hadoop FileSystem.
  */
object CsvSink {

  val Header = "Date,RadiationType,Longitude,Latitude,Radiation"

  /** Pure per-file render — byte-identical to `bom/bom.py:148-155`. */
  def renderCsv(points: Seq[RadiationPoint]): String =
    (Header +: points.map(p =>
      s"${p.date},${p.radiation_type},${p.longitude},${p.latitude},${p.radiation}"))
      .mkString("\n")

  /** Reference partition key for a file's points (`bom/bom.py:28-32`),
    * zero-padded like the reference's strftime output.
    */
  def partitionKey(p: RadiationPoint, baseName: String): String =
    f"year=${p.year}%04d/month=${p.month}%02d/day=${p.day}%02d/hour=${p.hour}%02d/$baseName.csv"

  /** Write one CSV object per source grid file under `servingDir`.
    * `files` carries (baseName, points) — points of one grid share one
    * partition key by construction (date metadata is per-file constant).
    */
  def write(files: Dataset[(String, Seq[RadiationPoint])], servingDir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      files.sparkSession.sparkContext.hadoopConfiguration)
    files.foreachPartition { it: Iterator[(String, Seq[RadiationPoint])] =>
      it.foreach { case (baseName, pts) =>
        if (pts.nonEmpty) {
          val key = partitionKey(pts.head, baseName)
          val path = new Path(s"$servingDir/$key")
          val fs = path.getFileSystem(conf.value)
          val out = fs.create(path, true)
          try out.write(renderCsv(pts).getBytes(StandardCharsets.UTF_8))
          finally out.close()
        }
      }
    }
  }
}
