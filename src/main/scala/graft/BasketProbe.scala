package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Scratch probe for q183 plan decisions, round-15 edition: an
  * INTERLEAVED same-JVM A/B of the r14 shipped formulation (no
  * checkpoint — ReuseExchange defeated by the toDF renames, so the
  * plan scans lineitem 4× and builds the collect_set basket aggregate
  * 3×, VERDICT r14 item 1) against the r15 fix (baskets + perPart
  * eagerly localCheckpoint'ed, lineitem scanned once). Alternating
  * A/B/A/B... so a host-contention window taxes both variants equally
  * — the AbProbe protocol. The r14 decision probe (self-join vs
  * basket variants, fallback-threshold, partition scaling) is in git
  * history and its readings in BASELINE.md's round-14 table.
  *
  * Usage: sbt "runMain graft.BasketProbe <sfDir> <reps>"
  */
object BasketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    // BY-NAME, constructed INSIDE the timed window: q183's eager
    // localCheckpoint runs real Spark jobs during DataFrame
    // construction, so a by-value parameter would exclude the basket
    // build from B's clock while A (fully lazy) pays everything —
    // exactly the bug the r15 review caught in this probe's first
    // committed reading.
    def finish(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // the r14 shipped formulation, verbatim minus the checkpoints
    def q183r14(spark: SparkSession, dir: String): DataFrame = {
      val baskets = table(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      val perPart = baskets.select(explode(col("ps")).as("pkey"))
        .groupBy(col("pkey")).agg(count(lit(1)).as("n_p"))
      baskets
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps) - i - 1),
            |    y -> struct(x AS pk_a, y AS pk_b))))""".stripMargin)).as("pr"))
        .select(col("pr.pk_a"), col("pr.pk_b"))
        .groupBy(col("pk_a"), col("pk_b"))
        .agg(count(lit(1)).as("pair_n"))
        .join(broadcast(perPart.toDF("pk_a", "n_a")), "pk_a")
        .join(broadcast(perPart.toDF("pk_b", "n_b")), "pk_b")
        .crossJoin(broadcast(nOrders))
        .select(col("pk_a"), col("pk_b"), col("pair_n"), col("n_a"),
          col("n_b"),
          expr("1000 * pair_n * n_orders DIV (n_a * n_b)")
            .as("lift_permille"))
        .orderBy(col("pair_n").desc, col("pk_a"), col("pk_b"))
        .limit(50)
    }

    // warm-up (uncounted), BOTH variants: JIT + parquet footers +
    // each side's one-time codegen/checkpoint code paths
    finish(q183r14(spark, sfDir))
    finish(graft.queries.Relational16.q183(spark, sfDir))

    val a = collection.mutable.Buffer[Double]()
    val b = collection.mutable.Buffer[Double]()
    (1 to reps).foreach { rep =>
      a += finish(q183r14(spark, sfDir))
      b += finish(graft.queries.Relational16.q183(spark, sfDir))
      println(f"[probe] rep $rep%2d  A r14-no-ckpt ${a.last}%7.1f s   " +
        f"B r15-ckpt ${b.last}%7.1f s")
    }
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    println(f"[probe] A r14-no-ckpt median ${med(a.toSeq)}%.1f s  " +
      a.map(t => f"$t%.1f").mkString("(", " ", ")"))
    println(f"[probe] B r15-ckpt    median ${med(b.toSeq)}%.1f s  " +
      b.map(t => f"$t%.1f").mkString("(", " ", ")"))
    println(f"[probe] speedup ${med(a.toSeq) / med(b.toSeq)}%.2fx")
    spark.stop()
  }
}
