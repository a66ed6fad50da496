package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.grid.{GridFixtures, GridReader}
import graft.streaming.Ingest

/** Batch + streaming ingest end-to-end over the embedded fixtures. */
class IngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  private def writeFixtures(dir: Path): Unit =
    GridFixtures.files.foreach { f =>
      Files.writeString(dir.resolve(f.name), f.content)
    }

  test("batch readGrids explodes all fixture files with metadata") {
    val in = tmp("grids-in")
    writeFixtures(in)
    val pts = GridReader.readGrids(spark, in.toString).collect()
    // 8 (f1) + 2 (f2) + 1 (f3) + 3 (f4) points survive NODATA filtering
    assert(pts.length == 14)
    val f1 = pts.filter(_.date == "2018-01-01 10:00")
    assert(f1.length == 8 && f1.forall(_.radiation_type == "radiation"))
    assert(f1.forall(p => p.year == 2018 && p.month == 1 && p.day == 1 && p.hour == 10))
  }

  test("writePartitioned produces the Hive year=/month=/day=/hour= layout") {
    val in = tmp("grids-in2"); writeFixtures(in)
    val out = tmp("grids-serving")
    GridReader.writePartitioned(GridReader.readGrids(spark, in.toString), out.toString)
    assert(Files.exists(out.resolve("year=2018/month=1/day=1/hour=10")))
    assert(Files.exists(out.resolve("year=2017/month=6/day=15/hour=12")))
    // partition pruning read-back
    val pruned = spark.read.parquet(out.toString)
      .filter("year = 2018 AND month = 1 AND day = 1 AND hour = 10")
    assert(pruned.count() == 8)
  }

  test("dynamic partition overwrite replaces only re-ingested partitions") {
    val in = tmp("dyn-in"); writeFixtures(in)
    val out = tmp("dyn-serving").toString
    GridReader.writePartitioned(GridReader.readGrids(spark, in.toString), out)
    assert(spark.read.parquet(out).count() == 14)

    // re-ingest ONLY f1 (partition 2018/1/1/10) in dynamic-overwrite mode
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val redo = tmp("dyn-redo")
      Files.writeString(redo.resolve(GridFixtures.f1.name), GridFixtures.f1.content)
      GridReader.writePartitioned(
        GridReader.readGrids(spark, redo.toString), out,
        org.apache.spark.sql.SaveMode.Overwrite)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // idempotent: f1's partition replaced (not doubled), others intact
    val back = spark.read.parquet(out)
    assert(back.count() == 14)
    assert(back.filter("year = 2018 AND month = 1").count() == 8)
    assert(back.filter("year = 2017").count() == 5)
  }

  test("streaming AvailableNow ingests good files and quarantines bad ones") {
    val in = tmp("stream-in"); writeFixtures(in)
    Files.writeString(in.resolve("BROKEN_radiation_20180101_0100.txt"),
      "this is not a grid\nat all")
    val serving = tmp("stream-serving").toString
    val checkpoint = tmp("stream-chk").toString
    val archive = tmp("stream-archive").toString
    val quarantine = tmp("stream-quarantine").toString

    // maxAttempts = 1: condemn on first failure (the pre-redrive behavior)
    Ingest.runAvailableNow(spark, in.toString, serving, checkpoint, archive,
      quarantine, maxAttempts = 1)

    assert(spark.read.parquet(serving).count() == 14)
    val bad = spark.read.json(quarantine)
    assert(bad.count() == 1)
    assert(bad.select("file_name").head.getString(0).contains("BROKEN"))
    assert(bad.select("attempts").head.getLong(0) == 1L)

    // second drain with one new file appends exactly its points (checkpoint
    // skips everything already processed)
    Files.writeString(in.resolve("IDZ00026_radiation_20190701_0300.txt"),
      GridFixtures.f3.content)
    Ingest.runAvailableNow(spark, in.toString, serving, checkpoint, archive,
      quarantine, maxAttempts = 1)
    assert(spark.read.parquet(serving).count() == 15)
  }

  test("transiently-failing file succeeds on redrive, never quarantined") {
    val in = tmp("redrive-in")
    Files.writeString(in.resolve(GridFixtures.f3.name), GridFixtures.f3.content)
    val serving = tmp("redrive-serving").toString
    val checkpoint = tmp("redrive-chk").toString
    val archive = tmp("redrive-archive").toString
    val quarantine = tmp("redrive-quarantine")

    IngestFlaky.calls.set(0)
    // fails the first 2 parse attempts, then behaves — a transient fault
    val flaky: (String, String) => Seq[graft.grid.RadiationPoint] =
      (name, text) => {
        if (IngestFlaky.calls.getAndIncrement() < 2)
          sys.error("transient downstream failure")
        GridReader.explodeFile(name, text).toSeq
      }

    (1 to 3).foreach { _ =>
      Ingest.runAvailableNow(spark, in.toString, serving, checkpoint,
        archive, quarantine.toString, maxAttempts = 5, parse = flaky)
    }
    // attempt 3 succeeded: the file's 1 point is served, nothing quarantined
    assert(spark.read.parquet(serving).count() == 1)
    assert(Option(quarantine.toFile.list()).forall(_.isEmpty))
    assert(IngestFlaky.calls.get() == 3)
    // a 4th drain finds nothing to do: no re-enqueue after success
    // (consumed files may still await async archiving, so assert on
    // behavior, not directory emptiness)
    Ingest.runAvailableNow(spark, in.toString, serving, checkpoint,
      archive, quarantine.toString, maxAttempts = 5, parse = flaky)
    assert(spark.read.parquet(serving).count() == 1)
    assert(IngestFlaky.calls.get() == 3)
    assert(Option(quarantine.toFile.list()).forall(_.isEmpty))
  }

  test("ProcessingTime soak: files across 3+ micro-batches, restart " +
    "mid-stream, nothing lost or duplicated, equal to one AvailableNow run") {
    val in = tmp("soak-in")
    val serving = tmp("soak-serving").toString
    val checkpoint = tmp("soak-chk").toString
    val archive = tmp("soak-archive").toString
    val quarantine = tmp("soak-quarantine").toString

    def served(): Long =
      scala.util.Try(spark.read.parquet(serving).count()).getOrElse(0L)
    def waitServed(n: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (served() != n && System.nanoTime() < deadline) Thread.sleep(100)
      assert(served() == n, s"timed out waiting for $n served points")
    }

    // three arrivals while the query runs = three separate micro-batches
    // (each file lands alone; the 150 ms trigger drains it before the next)
    Files.writeString(in.resolve(GridFixtures.f1.name), GridFixtures.f1.content)
    val q1 = Ingest.runProcessingTime(spark, in.toString, serving, checkpoint,
      archive, quarantine, intervalMs = 150L)
    try {
      waitServed(8) // f1
      Files.writeString(in.resolve(GridFixtures.f2.name), GridFixtures.f2.content)
      waitServed(10) // + f2
      Files.writeString(in.resolve(GridFixtures.f3.name), GridFixtures.f3.content)
      waitServed(11) // + f3
    } finally q1.stop() // restart point: stream down mid-arrival-sequence
    assert(!q1.isActive)

    // f4 arrives while the engine is DOWN; the restarted query must pick
    // up exactly it — everything before the stop stays committed in the
    // checkpoint (no replay), f4 is not missed
    Files.writeString(in.resolve(GridFixtures.f4.name), GridFixtures.f4.content)
    val q2 = Ingest.runProcessingTime(spark, in.toString, serving, checkpoint,
      archive, quarantine, intervalMs = 150L)
    try waitServed(14) finally q2.stop()

    // exactly-once across the restart: 14 points, no file double-served
    val soaked = spark.read.parquet(serving)
    assert(soaked.count() == 14)
    assert(Option(new java.io.File(quarantine).list()).forall(_.isEmpty))

    // parity: one AvailableNow drain over the same four files produces
    // the IDENTICAL partitioned dataset
    val in2 = tmp("soak-once-in"); writeFixtures(in2)
    val serving2 = tmp("soak-once-serving").toString
    Ingest.runAvailableNow(spark, in2.toString, serving2,
      tmp("soak-once-chk").toString, tmp("soak-once-archive").toString,
      tmp("soak-once-quarantine").toString)
    val once = spark.read.parquet(serving2)
    assert(soaked.exceptAll(once).isEmpty && once.exceptAll(soaked).isEmpty,
      "soak output diverges from the one-shot AvailableNow dataset")
  }

  test("permanently-bad file quarantines after exactly maxAttempts tries") {
    val in = tmp("poison-in")
    Files.writeString(in.resolve("POISON_radiation_20180101_0100.txt"),
      "never a grid")
    val serving = tmp("poison-serving")
    val checkpoint = tmp("poison-chk").toString
    val archive = tmp("poison-archive").toString
    val quarantine = tmp("poison-quarantine").toString

    // 5 drains with maxAttempts = 3: quarantined at drain 3; drains 4-5
    // must neither re-attempt nor re-quarantine it
    (1 to 5).foreach { _ =>
      Ingest.runAvailableNow(spark, in.toString, serving.toString, checkpoint,
        archive, quarantine, maxAttempts = 3)
    }
    val bad = spark.read.json(quarantine)
    assert(bad.count() == 1)
    val row = bad.select("file_name", "attempts").head
    assert(row.getString(0) == "POISON_radiation_20180101_0100.txt")
    assert(row.getLong(1) == 3L)
    // nothing served, and attempt 4 was never enqueued — neither still
    // pending in the inbox nor already archived
    assert(Option(serving.toFile.list()).forall(
      _.forall(f => f.startsWith("_") || f.startsWith("."))))
    def treeHasRetry4(dir: java.io.File): Boolean =
      Option(dir.listFiles()).toSeq.flatten.exists(f =>
        (f.isFile && f.getName.startsWith("retry4__")) ||
          (f.isDirectory && treeHasRetry4(f)))
    assert(!treeHasRetry4(new java.io.File(in.toString)))
    assert(!treeHasRetry4(new java.io.File(archive)))
  }

  test("reenqueue materializes atomically: exact bytes, no temp leftovers") {
    val dir = tmp("reenq")
    val text = "0 1 2 3\n" * 4096 // ~32 KiB, multi-block on most FS
    Ingest.reenqueue(dir.toString, "retry2__f.txt", text)
    assert(Files.readString(dir.resolve("retry2__f.txt")) == text)
    // the staging temp is gone — ATOMIC_MOVE consumed it; a leftover
    // would mean a torn create+write path is back
    assert(dir.toFile.list().toSeq == Seq("retry2__f.txt"))
  }

  test("poisoned batch of oversized corrupt files: redrive semantics " +
    "unchanged, retry files byte-exact, no torn temps") {
    val in = tmp("poison-batch-in")
    // 6 corrupt files × 1 MiB: big enough that collecting their text to
    // the driver would be the old failure mode; processBatch now moves
    // only (name, attempt, error) rows driver-side
    val big = (1 to 16384).map(i => s"not a grid line $i padded " +
      "x" * 40).mkString("\n")
    val names = (1 to 6).map(i => s"BIG${i}_radiation_20180101_0100.txt")
    names.foreach(n => Files.writeString(in.resolve(n), big))
    val serving = tmp("poison-batch-serving").toString
    val checkpoint = tmp("poison-batch-chk").toString
    val archive = tmp("poison-batch-archive").toString
    val quarantine = tmp("poison-batch-quarantine").toString

    Ingest.runAvailableNow(spark, in.toString, serving, checkpoint,
      archive, quarantine, maxAttempts = 2)
    // drain 1 re-enqueued every file once, ATOMICALLY: the retry file
    // carries the FULL original bytes (a torn write would truncate and
    // silently corrupt the retry chain) and no hidden staging temp leaks
    val left = Option(in.toFile.list()).toSeq.flatten
    assert(!left.exists(_.startsWith(".retrytmp_")), left.toString)
    names.foreach { n =>
      assert(Files.readString(in.resolve(s"retry2__$n")) == big,
        s"retry2__$n is not byte-identical to the original")
    }

    Ingest.runAvailableNow(spark, in.toString, serving, checkpoint,
      archive, quarantine, maxAttempts = 2)
    // drain 2 exhausted all 6 (attempt 2 == maxAttempts): quarantined
    // with the full attempt history, nothing served, no retry3 enqueued
    val bad = spark.read.json(quarantine)
    assert(bad.count() == 6)
    assert(bad.collect().forall(_.getAs[Long]("attempts") == 2L))
    val after = Option(in.toFile.list()).toSeq.flatten
    assert(!after.exists(f => f.startsWith("retry3__") ||
      f.startsWith(".retrytmp_")), after.toString)
  }
}

/** Shared fault-injection counter: a top-level object so the executor-side
  * closure resolves it statically (same JVM in local mode).
  */
object IngestFlaky {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}
