package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q33-q35: second relational pack — exact percentiles, conditional
  * pivot, and deterministic array aggregation.
  */
object Relational2 {

  // ---------------------------------------------------------------- q33

  private val Quantiles = Seq("25" -> 0.25, "50" -> 0.5, "75" -> 0.75)
  private val HistBins = 1024

  /** Exact interpolated percentiles per return flag via distributed
    * two-pass k-th selection — no per-group global sort anywhere, so
    * parallelism is NOT bounded by the group count (the round-3
    * window-rank form funneled all 600k rows through 3 reducers):
    *
    *  1. Pass 1: per-group (min, max, count), then a per-(group, bin)
    *     histogram over 1024 equi-width bins — both are ordinary
    *     map-side-partial hash aggregations over the full cluster. The
    *     driver receives only groups×bins counts (bounded METADATA,
    *     independent of data size — same trust model as AQE stats) and
    *     locates, for each quantile, the bin holding positions
    *     floor/ceil((n-1)·q) plus the rank of each within its bin.
    *  2. Pass 2: re-scan ONLY rows in candidate bins (≤ 6 bins/group;
    *     a conjunctive price-range predicate reaches the parquet scan
    *     as a PushedFilter), row_number within (group, bin) — tiny
    *     local sorts of ~n/1024 rows each — and keep the target ranks.
    *
    * Picked lo/hi values join (broadcast) to a ≤18-row target map and
    * fold into one row per group. The interpolation
    * `(1-frac)*lo + frac*hi` and its operand doubles are the exact
    * expressions the previous formulation used, so the result stays
    * bit-identical to DuckDB's quantile_cont (the algebraic twin
    * `lo + frac*(hi-lo)` is NOT — off by 1 ULP on ~10% of picks).
    * Rounding stays at the group level only.
    */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    val rows = table(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("p"))

    // pass 1a: per-group extent + count (3 rows to the driver)
    val stats = rows.groupBy(col("flag"))
      .agg(min(col("p")).as("mn"), max(col("p")).as("mx"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap

    // bin id, identical expression in pass 1b and pass 2: equi-width
    // over [mn, mx], top value clamped into the last bin
    def binCol: org.apache.spark.sql.Column = {
      val branches = stats.toSeq.sortBy(_._1).map { case (f, (mn, mx, _)) =>
        val w = (mx - mn) / HistBins
        (col("flag") === f,
          least(floor((col("p") - lit(mn)) / lit(w)), lit(HistBins - 1L)))
      }
      branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
        case (acc, (c, v)) => acc.when(c, v)
      }
    }

    // pass 1b: histogram — groups×1024 counts back to the driver
    val hist = rows.withColumn("bin", binCol)
      .groupBy(col("flag"), col("bin")).agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) =>
        f -> rs.map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
      }

    // driver: locate each quantile position's bin + in-bin rank
    // targets: (flag, tag, role, bin, rank) tuples plus per-flag frac/n
    val targets: Seq[(String, String, String, Long, Long)] =
      stats.toSeq.sortBy(_._1).flatMap { case (f, (_, _, n)) =>
        val cum = hist(f).scanLeft((Long.MinValue, 0L)) {
          case ((_, acc), (bin, c)) => (bin, acc + c)
        }.tail // (bin, cumulative count through bin)
        def locate(pos: Long): (Long, Long) = {
          val before = cum.takeWhile(_._2 <= pos)
          val bin = if (before.length == cum.length) cum.last._1
            else cum(before.length)._1
          val cumBefore = if (before.isEmpty) 0L else before.last._2
          (bin, pos - cumBefore)
        }
        Quantiles.flatMap { case (tag, q) =>
          val exact = (n - 1) * q
          val (loBin, loRank) = locate(math.floor(exact).toLong)
          val (hiBin, hiRank) = locate(math.ceil(exact).toLong)
          Seq((f, tag, "lo", loBin, loRank), (f, tag, "hi", hiBin, hiRank))
        }
      }
    import spark.implicits._
    val targetDf = targets.toDF("tflag", "tag", "role", "tbin", "rank")

    // pass 2: only candidate bins survive the scan; the coarse price
    // range below is parquet-pushable, the exact (flag, bin) set is a
    // residual filter; per-(flag, bin) row_number sorts ~n/1024 rows
    val candBins = targets.map(t => (t._1, t._4)).toSet
    val loP = stats.map { case (f, (mn, mx, _)) =>
      val w = (mx - mn) / HistBins
      mn + candBins.filter(_._1 == f).map(_._2).min * w
    }.min
    val hiP = stats.map { case (f, (mn, mx, _)) =>
      val w = (mx - mn) / HistBins
      mn + (candBins.filter(_._1 == f).map(_._2).max + 1) * w
    }.max
    val binFilter = candBins.toSeq.sorted
      .map { case (f, b) => col("flag") === f && col("bin") === b }
      .reduce(_ || _)
    val w33 = Window.partitionBy(col("flag"), col("bin")).orderBy(col("p"))
    val picked = rows
      .filter(col("p") >= loP && col("p") <= hiP)
      .withColumn("bin", binCol)
      .filter(binFilter)
      .withColumn("rn", row_number().over(w33) - 1)
      .join(broadcast(targetDf),
        col("flag") === col("tflag") && col("bin") === col("tbin") &&
          col("rn") === col("rank"))

    // fold the ≤18 picked rows into one row per group and interpolate
    // with the bit-pinned formula; frac/n enter as per-flag literals
    val fracDf = stats.toSeq.sortBy(_._1).map { case (f, (_, _, n)) =>
      val fr = Quantiles.map { case (_, q) =>
        val exact = (n - 1) * q
        exact - math.floor(exact)
      }
      (f, fr(0), fr(1), fr(2), n)
    }.toDF("fflag", "frac25", "frac50", "frac75", "n")
    val slots = Quantiles.flatMap { case (tag, _) =>
      Seq(
        max(when(col("tag") === tag && col("role") === "lo", col("p")))
          .as(s"lo$tag"),
        max(when(col("tag") === tag && col("role") === "hi", col("p")))
          .as(s"hi$tag"))
    }
    picked.groupBy(col("flag"))
      .agg(slots.head, slots.tail: _*)
      .join(broadcast(fracDf), col("flag") === col("fflag"))
      .select(
        col("flag").as("l_returnflag") +:
          Quantiles.map { case (tag, _) =>
            round((lit(1.0) - col(s"frac$tag")) * col(s"lo$tag") +
              col(s"frac$tag") * col(s"hi$tag"), 4).as(s"p$tag")
          } :+ col("n"): _*)
      .orderBy(col("l_returnflag"))
  }

  val q33Oracle: String =
    """WITH q AS (
      |  SELECT l_returnflag,
      |         quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS ps,
      |         count(*) AS n
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag,
      |       round(ps[1], 4) AS p25, round(ps[2], 4) AS p50,
      |       round(ps[3], 4) AS p75, n
      |FROM q ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q34

  /** Conditional-aggregate pivot: daily event counts spread across one
    * column per event type (`sum(CASE WHEN ...)`) — the shuffle-free way
    * to pivot a low-cardinality dimension at scale (vs `pivot()`, which
    * needs a value scan or an explicit list anyway).
    */
  private val EventTypes = graft.Tables.EventTypes

  def q34(spark: SparkSession, dir: String): DataFrame = {
    val perType = EventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
    table(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(perType.head, perType.tail: _*)
      .orderBy(col("day"))
  }

  /** Oracle casts: DuckDB `date_trunc('day', ts)` yields DATE (Spark
    * yields TIMESTAMP — 'hour' stays TIMESTAMP in both, which is why q20
    * never tripped), and `sum(INTEGER)` yields HUGEINT → float64 through
    * pandas. Both must be pinned to the Spark-side types for the driver's
    * value hash to line up.
    */
  val q34Oracle: String = {
    val cols = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t")
      .mkString(",\n       ")
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       $cols
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q35

  /** Deterministic array aggregation: collect_list is order-nondeterministic
    * by itself, so the engine contract is sort-then-join — the pattern any
    * scale-safe array agg must follow.
    */
  def q35(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .filter(col("c_custkey") % 199 === 0)
      .groupBy(col("c_mktsegment"))
      .agg(
        expr("""array_join(transform(sort_array(collect_list(c_custkey)),
                e -> cast(e as string)), ',')""").as("sample_keys"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))

  val q35Oracle: String =
    """SELECT c_mktsegment,
      |       array_to_string(list_sort(list(c_custkey)), ',') AS sample_keys,
      |       count(*) AS n
      |FROM customer WHERE c_custkey % 199 = 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_percentiles" -> (q33 _),
    "q34_conditional_pivot" -> (q34 _),
    "q35_array_agg" -> (q35 _))

  val oracles: Map[String, String] = Map(
    "q33_percentiles" -> q33Oracle,
    "q34_conditional_pivot" -> q34Oracle,
    "q35_array_agg" -> q35Oracle)
}
