package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** File state-machine utilities (reference O10/O11/O24/O25): the
  * `in/ → processing/ → done/` object moves (`bom/bom.py:16-25`), the
  * stack-teardown prefix cleanup
  * (`bom-clean-test-files/bom_clean_test_files.py:43-49`), and the
  * bucket/prefix bootstrap
  * (`bom-create-bucket/bom_create_bucket.py:121-124`) over any
  * Hadoop-compatible filesystem (local, HDFS, S3A — same API at 100 TB).
  *
  * The streaming path does not need these (checkpoint + archive subsume
  * the state machine); they exist for batch choreography parity.
  */
object FileOps {

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** O10: move = copy + delete in the reference (`bom/bom.py:16-20`);
    * a filesystem rename is the atomic equivalent.
    */
  def move(spark: SparkSession, from: String, to: String): Boolean = {
    val (f, src) = fs(spark, from)
    val dst = new Path(to)
    f.mkdirs(dst.getParent)
    f.rename(src, dst)
  }

  /** O11: copy (`bom/bom.py:23-25`). */
  def copy(spark: SparkSession, from: String, to: String): Boolean = {
    val (f, src) = fs(spark, from)
    val dst = new Path(to)
    f.mkdirs(dst.getParent)
    FileUtil.copy(f, src, f, dst, false, f.getConf)
  }

  /** O24: recursive prefix delete. */
  def deletePrefix(spark: SparkSession, prefix: String): Boolean = {
    val (f, p) = fs(spark, prefix)
    !f.exists(p) || f.delete(p, true)
  }

  /** O25: bootstrap the four stage prefixes under a root. */
  def bootstrapStages(spark: SparkSession, root: String): Seq[String] = {
    val stages = Seq("in", "processing", "done", "athena")
    stages.map { s =>
      val (f, p) = fs(spark, s"$root/$s")
      f.mkdirs(p)
      p.toString
    }
  }

  def listPrefix(spark: SparkSession, prefix: String): Seq[String] = {
    val (f, p) = fs(spark, prefix)
    if (!f.exists(p)) Seq.empty
    else {
      val it = f.listFiles(p, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) buf += it.next().getPath.toString
      buf.result()
    }
  }
}
