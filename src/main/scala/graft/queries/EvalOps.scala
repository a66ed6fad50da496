package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.CrossHash

/** Evaluation-set engineering and split hygiene —
  * Neyman (variance-optimal) eval allocation (q252) and the
  * contamination BLAST RADIUS through near-dup clusters (q253).
  */
object EvalOps {

  // ---------------------------------------------------------------- q252

  /** Eval budget the allocation distributes (documents). */
  val EvalBudget = 1000L

  /** q252: NEYMAN allocation of an eval budget across language strata —
    * the variance-optimal sampling rule (n_h ∝ N_h·σ_h, Neyman 1934)
    * q108's Hamilton apportionment deliberately ignores: proportional
    * allocation wastes budget on large LOW-VARIANCE strata, while
    * Neyman spends it where the quality score actually varies, shrinking
    * the estimator's variance at the same budget. The weight N_h·σ_h is
    * computed WITHOUT any float variance: N·σ = √(n·Σq² − (Σq)²)
    * exactly, so the weight is isqrt(M_h) of an integer moment held in
    * DECIMAL(38,0)/HUGEINT (int64 would wrap at ~3·10⁶ docs per
    * stratum) — both engines take floor(IEEE √) of the identical
    * integer (exact below 2⁵³; above, still bit-identical
    * cross-engine, within ±1 of true — the q165 isqrt discipline).
    * Output per language: stratum size, the
    * moment root, the Neyman and proportional allocations, and their
    * difference (the shift the variance information buys). Floor
    * remainders are deliberately not redistributed — q108 owns the
    * apportionment-of-remainders problem.
    *
    * Scale shape: one corpus scan into per-lang integer moments
    * (map-side partial); the weight total and both allocations run on
    * the language-domain frame.
    */
  def q252(spark: SparkSession, dir: String): DataFrame = {
    val mom = Dedup.withQualU3(
        table(spark, dir, "documents")
          .withColumn("n_chars", length(col("text")).cast("long")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("q_u3")).as("s"),
        sum(col("q_u3") * col("q_u3")).as("s2"))
      // the moment n·Σq² − (Σq)² in DECIMAL(38,0): n·s2 would wrap
      // int64 at only ~3·10⁶ docs per stratum (s2 ≤ n·10⁶); 38 digits
      // hold it exactly for any corpus below ~10¹⁶ docs, and both
      // engines (Spark decimal, DuckDB HUGEINT) stay exact before the
      // one cast to double the isqrt reads
      .withColumn("w",
        floor(sqrt((col("n_docs").cast("decimal(38,0)") * col("s2") -
          col("s").cast("decimal(38,0)") * col("s"))
          .cast("double"))).cast("long"))
    val w = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    mom
      .withColumn("tot_w", sum(col("w")).over(w))
      .withColumn("tot_n", sum(col("n_docs")).over(w))
      .select(col("lang"), col("n_docs"), col("w"),
        expr(s"($EvalBudget * w) div nullif(tot_w, 0)").as("neyman_docs"),
        expr(s"($EvalBudget * n_docs) div tot_n").as("prop_docs"))
      .withColumn("shift", expr("neyman_docs - prop_docs"))
      .orderBy(col("lang"))
  }

  val q252Oracle: String = {
    val qualSql = Dedup.QualU3Expr.replace(" div ", " // ")
    s"""WITH docsq AS (
       |  SELECT lang, $qualSql AS q_u3
       |  FROM (
       |    SELECT lang, length(text) AS n_chars,
       |           len(list_filter(string_split(text, ' '), t -> t <> ''))
       |             AS n_tokens,
       |           len(list_filter(string_split(text, ' '),
       |               t -> t IN ('the', 'a', 'of', 'and', 'in')))
       |             AS stop_tokens,
       |           length(regexp_replace(text, '[^a-z]', '', 'g'))
       |             AS alpha_chars
       |    FROM documents)),
       |mom AS (
       |  SELECT lang, count(*) AS n_docs,
       |         CAST(sum(q_u3) AS BIGINT) AS s,
       |         CAST(sum(q_u3 * q_u3) AS BIGINT) AS s2
       |  FROM docsq GROUP BY lang),
       |wt AS (
       |  SELECT lang, n_docs,
       |         CAST(floor(sqrt(CAST(CAST(n_docs AS HUGEINT) * s2 -
       |                              CAST(s AS HUGEINT) * s AS DOUBLE)))
       |              AS BIGINT) AS w
       |  FROM mom),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tot_w,
       |               CAST(sum(n_docs) AS BIGINT) AS tot_n FROM wt)
       |SELECT lang, n_docs, w,
       |       ($EvalBudget * w) // nullif(tot_w, 0) AS neyman_docs,
       |       ($EvalBudget * n_docs) // tot_n AS prop_docs,
       |       ($EvalBudget * w) // nullif(tot_w, 0) -
       |         ($EvalBudget * n_docs) // tot_n AS shift
       |FROM wt CROSS JOIN tot ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q253

  /** q253: contamination BLAST RADIUS — q120 finds train↔eval EXACT
    * content collisions; this answers the question a quarantine
    * actually needs: "which OTHER train documents are compromised
    * because they are near-dups of a leaked one?" A paraphrase of a
    * leaked doc teaches the eval answer just as well, so the quarantine
    * set is the direct leaks PLUS every train doc sharing a near-dup
    * CC cluster with one (the full transitive closure — labels ARE
    * components). Per language: train size, direct leaks (train docs
    * whose fp appears in the val/test fp set), transitive additions,
    * and the quarantine permille.
    *
    * Composes three memoized artifacts — [[PipelineOps9.assignedFps]]
    * (the split + fp projection), its eval-side fp set, and
    * [[Dedup.ccLabels]] (the banding + CC fixpoint) — so the marginal
    * cost over q120+q156 is three label-domain joins. The oracle
    * replays the identical CC walk via [[Dedup.ccWalkCtes]].
    *
    * Regime coverage: sf0.01 has zero cross-split collisions (the
    * all-clean path), sf0.1 has direct hits — the two gates TOGETHER
    * pin both branches (the q243 pattern); the transitive MECHANISM is
    * pinned by the spec's crafted fixture corpus, where a train
    * paraphrase of a leaked doc must be quarantined.
    */
  def q253(spark: SparkSession, dir: String): DataFrame = {
    val assigned = PipelineOps9.assignedFps(spark, dir)
    val evalFps = assigned.filter(col("split") =!= "train")
      .select(col("fp")).distinct()
      .withColumn("hit", lit(true))
    val labels = Dedup.ccLabels(spark, dir)._1
      .withColumnRenamed("id", "doc_id")
    val tr = assigned.filter(col("split") === "train")
      .join(evalFps, Seq("fp"), "left")
      .withColumn("direct", coalesce(col("hit"), lit(false)))
      .drop("hit")
      .join(labels, Seq("doc_id"), "left")
    val contam = tr.filter(col("direct") && col("label").isNotNull)
      .select(col("label")).distinct()
      .withColumn("chit", lit(true))
    tr.join(contam, Seq("label"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_train"),
        sum(when(col("direct"), 1L).otherwise(0L)).as("n_direct"),
        sum(when(!col("direct") && coalesce(col("chit"), lit(false)), 1L)
          .otherwise(0L)).as("n_transitive"))
      .withColumn("quarantine_permille",
        expr("(1000 * (n_direct + n_transitive)) div n_train"))
      .orderBy(col("lang"))
  }

  val q253Oracle: String = {
    val h = CrossHash.h60Sql("'split:' || CAST(doc_id AS VARCHAR)")
    val fp = CrossHash.h60Sql("text")
    s"""WITH RECURSIVE ${Dedup.ccWalkCtes},
       |assigned AS (
       |  SELECT doc_id, lang, $fp AS fp,
       |         CASE WHEN $h % 1000 < ${PipelineOps9.SplitTrainUpto}
       |              THEN 'train' ELSE 'eval' END AS split
       |  FROM documents),
       |eval_fps AS (
       |  SELECT DISTINCT fp FROM assigned WHERE split <> 'train'),
       |tr AS (
       |  SELECT a.doc_id, a.lang,
       |         CASE WHEN e.fp IS NOT NULL THEN 1 ELSE 0 END AS direct,
       |         l.label
       |  FROM assigned a
       |  LEFT JOIN eval_fps e ON a.fp = e.fp
       |  LEFT JOIN labels l ON a.doc_id = l.id
       |  WHERE a.split = 'train'),
       |contam AS (
       |  SELECT DISTINCT label FROM tr
       |  WHERE direct = 1 AND label IS NOT NULL)
       |SELECT t.lang, count(*) AS n_train,
       |       CAST(sum(t.direct) AS BIGINT) AS n_direct,
       |       CAST(sum(CASE WHEN t.direct = 0 AND c.label IS NOT NULL
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_transitive,
       |       (1000 * (CAST(sum(t.direct) AS BIGINT) +
       |          CAST(sum(CASE WHEN t.direct = 0 AND c.label IS NOT NULL
       |                        THEN 1 ELSE 0 END) AS BIGINT))) // count(*)
       |         AS quarantine_permille
       |FROM tr t LEFT JOIN contam c ON t.label = c.label
       |GROUP BY t.lang ORDER BY t.lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q252_neyman_allocation" -> (q252 _),
    "q253_leak_blast_radius" -> (q253 _))

  val oracles: Map[String, String] = Map(
    "q252_neyman_allocation" -> q252Oracle,
    "q253_leak_blast_radius" -> q253Oracle)
}
