package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for headroom benchmarking: writes `copies`
  * key-shifted copies of a source scale-factor directory (e.g. sf0.1 ×10
  * ≈ sf1) so bench queries can be checked for super-linear blowup beyond
  * the driver-provided corpora. Usage:
  *
  *   sbt "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10 [saltPermille] [tablesCsv] [outFiles]"
  *
  * `copies = 1` is a pure re-layout (no key shift at copy 0, no word
  * shuffle, no rotation): with `outFiles` = N it writes a bit-identical
  * corpus spread over N files per table — the multi-row-group fixture
  * for scan-parallelism measurements (the driver corpus is one file /
  * one row group per table, so scan stages there are always 1 task).
  *
  * Semantics per table:
  *  - `region`/`nation` are dimensions — copied once, unshifted.
  *  - Fact/entity keys (orderkey, custkey, partkey, suppkey, event_id,
  *    user_id, doc_id, vec_id) shift by copy·10⁷, preserving every
  *    cross-table join relationship within each copy.
  *  - `documents.text` is word-shuffled per copy (seeded): replicating
  *    text verbatim would make every doc a 10-way exact+near duplicate,
  *    flooding LSH buckets with an artifact the real corpus doesn't
  *    have; shuffling destroys the 3-shingle sets while keeping
  *    length/token statistics identical.
  *  - `embeddings.embedding` is rotated by copy positions — norm-
  *    preserving but direction-changing, so copies aren't artificial
  *    cosine near-dups.
  *
  * **Vocabulary salt (VERDICT r15 item 1).** Word-shuffling keeps the
  * token SET of every base doc identical across copies, so the scaled
  * corpus's vocabulary is FIXED while real corpora grow vocabulary with
  * size (Heaps' law) — at the sf10 rung this saturated the shingle/
  * fingerprint space into ~100× set-identical candidate pairs (the
  * q173/q210 second-rung artifact). With `saltPermille` > 0, that
  * fraction of docs (selected by `doc_id % 1000`, deterministic — the
  * SAME base docs in every copy) have every token suffixed with the
  * copy id in copies c > 0: salted docs share no shingles across
  * copies, so cross-copy pair growth comes only from the unsalted
  * fraction. At 1000‰ every copy carries a fresh vocabulary and the
  * cross-copy set-identity artifact is zero by construction — an upper
  * bound on real vocabulary growth, where the fixed-vocab corpus is
  * the lower bound (real data sits between; its residual duplication
  * is already present WITHIN the base corpus and scales linearly).
  * Empty tokens (consecutive spaces) are left unsalted so token/length
  * statistics stay comparable.
  *
  * `tablesCsv` restricts generation to a subset (e.g. `documents`) —
  * the fresh-vocab rung only changes documents, so the other tables
  * symlink to the existing scaled dir instead of being rewritten.
  *
  * The output is bench-only data (never oracle-gated): distributions
  * match the driver corpus per copy, cardinalities scale linearly.
  */
object ScaleUp {

  private val Shift = 10_000_000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val dstDir = args(1)
    val copies = args(2).toInt
    val saltPermille = args.lift(3).map(_.toInt).getOrElse(0)
    require(saltPermille >= 0 && saltPermille <= 1000,
      s"saltPermille must be in [0, 1000], got $saltPermille")
    val tableFilter = args.lift(4).map(_.split(',').map(_.trim).toSet)
    // optional 6th arg: output files per table (0 = source layout) —
    // the multi-row-group fixture knob; see the write site below
    val outFiles = args.lift(5).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    // events.ts is TIMESTAMP(NANOS): read the raw nanos as long and write
    // them back as plain int64 — Tables.events handles both encodings
    // (`ts div 1000` over long), so scaled dirs stay drop-in compatible
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for (dim <- Seq("region", "nation")
         if tableFilter.forall(_.contains(dim)))
      spark.read.parquet(s"$srcDir/$dim.parquet")
        .write.mode("overwrite").parquet(s"$dstDir/$dim.parquet")

    keyCols.filter { case (n, _) => tableFilter.forall(_.contains(n)) }
      .foreach { case (name, keys) =>
      val src = spark.read.parquet(s"$srcDir/$name.parquet")
      val scaled = (0 until copies).map { c =>
        val shifted = keys.foldLeft(src)((df, k) =>
          df.withColumn(k, col(k) + lit(c * Shift)))
        name match {
          case "documents" =>
            // copies == 1 is a pure RE-LAYOUT (the multi-row-group
            // fixture, VERDICT r16 item 7): rows must stay bit-identical
            // to the source so results remain comparable — the word
            // shuffle exists only to break cross-COPY near-duplication,
            // which a single copy cannot have
            if (copies == 1) shifted else {
            val shuffled = shifted.withColumn("text",
              array_join(shuffle(split(col("text"), " "), lit(c)), " "))
            // per-copy vocab salt: c·10⁷ % 1000 = 0, so the shifted
            // doc_id selects the SAME base docs in every copy
            if (saltPermille > 0 && c > 0)
              shuffled.withColumn("text",
                when(pmod(col("doc_id"), lit(1000)) < saltPermille,
                  array_join(transform(split(col("text"), " "),
                    t => when(t === "", t)
                      .otherwise(concat(t, lit("x" + c)))), " "))
                  .otherwise(col("text")))
            else shuffled
            }
          case "embeddings" if copies > 1 =>
            val rot = c % 64
            if (rot == 0) shifted
            else shifted.withColumn("embedding",
              concat(slice(col("embedding"), rot + 1, 64 - rot),
                slice(col("embedding"), 1, rot)))
          case _ => shifted
        }
      }.reduce(_ union _)
      // outFiles > 0: spread each table over that many output files
      // (VERDICT r16 item 7 — the driver corpus is ONE file with ONE
      // row group per table, so every scan stage is 1 task and no
      // parallelism claim is testable at any core count; a fixture
      // with ≥ cores files lets scan-bound queries actually scale).
      // Round-robin repartition, not keyed: layout only, no skew.
      val out = if (outFiles > 0) scaled.repartition(outFiles) else scaled
      out.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dstDir/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
