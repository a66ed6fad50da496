package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Scratch probe for the q183 rewrite decision at the sf10 rung:
  * times the old self-join formulation, the shipped basket/transform
  * formulation, and a distinct+collect_list variant back-to-back in
  * one JVM (same host window — the only variance control available on
  * this shared VM), plus repeated q131 runs to characterize its
  * untouched-code rung variance.
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

    def finish(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(label: String)(thunk: => DataFrame): Unit = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); finish(thunk); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-22s ${runs.map(t => f"$t%.1f").mkString(" ")} s")
    }

    def lift(pairs: DataFrame, items: DataFrame): DataFrame = {
      val nOrders = items.select(col("okey")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      val perPart = items.groupBy(col("pkey")).agg(count(lit(1)).as("n_p"))
      pairs
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

    def items = table(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("pkey"))
      .distinct()

    // A: the pre-r14 self-join formulation
    time("A self-join") {
      val a = items.toDF("okey_a", "pk_a")
      val b = items.toDF("okey_b", "pk_b")
      lift(a.join(b, col("okey_a") === col("okey_b") && col("pk_a") < col("pk_b"))
        .select(col("pk_a"), col("pk_b")), items)
    }

    // B: the shipped basket/collect_set formulation
    time("B collect_set") {
      graft.queries.Relational16.q183(spark, sfDir)
    }

    // C: distinct first (codegen hash agg), then collect_list baskets
    time("C distinct+list") {
      val baskets = items.groupBy(col("okey"))
        .agg(sort_array(collect_list(col("pkey"))).as("ps"))
      val pairs = baskets.select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    y -> struct(x AS pk_a, y AS pk_b))))""".stripMargin)).as("pr"))
        .select(col("pr.pk_a"), col("pr.pk_b"))
      lift(pairs, items)
    }

    // B decomposition: where do the ~33 s go?
    def baskets = table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    time("B1 baskets only") { baskets }
    time("B2 +pair explode") {
      baskets.select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    y -> struct(x AS pk_a, y AS pk_b))))""".stripMargin)).as("pr"))
        .select(col("pr.pk_a"), col("pr.pk_b"))
    }
    time("B3 +pair agg") {
      baskets.select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |    y -> struct(x AS pk_a, y AS pk_b))))""".stripMargin)).as("pr"))
        .select(col("pr.pk_a"), col("pr.pk_b"))
        .groupBy(col("pk_a"), col("pk_b"))
        .agg(count(lit(1)).as("pair_n"))
    }
    // conf is read at EXECUTION, so it wraps the timed runs, not the
    // DataFrame construction; capture-and-restore the PREVIOUS value
    // (the IntSqDistSpec factoryMode pattern) so later probe runs see
    // the session's real settings, not a guess at the default
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val fbPrev = spark.conf.get(fbKey)
    spark.conf.set(fbKey, "500000")
    time("B4 raised fallback") {
      graft.queries.Relational16.q183(spark, sfDir)
    }
    spark.conf.set(fbKey, fbPrev)

    // does reducer scaling help the NEW shape? (the r13 experiment
    // proved it hurt the OLD map-side-fan-out shape 1.5x; the rewrite
    // moved the cost to the pair-count REDUCE side, where more
    // partitions shrink each reducer's hash map)
    val spKey = "spark.sql.shuffle.partitions"
    val spPrev = spark.conf.get(spKey)
    spark.conf.set(spKey, "128")
    time("B @128 partitions") {
      graft.queries.Relational16.q183(spark, sfDir)
    }
    spark.conf.set(spKey, spPrev)

    // q131 untouched-code variance characterization
    time("q131 repeats") {
      graft.queries.Relational9.q131(spark, sfDir)
    }

    spark.stop()
  }
}
