package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q173: exact set-similarity self-join with prefix filtering — the
  * PPJoin/All-Pairs family (Bayardo, Ma & Srikant, WWW'07 "Scaling Up
  * All Pairs Similarity Search"; Xiao, Wang, Lin & Yu, WWW'08 "Efficient
  * Similarity Joins for Near Duplicate Detection").
  *
  * Semantics: ALL document pairs whose 5-token-shingle-set Jaccard is
  * ≥ τ — the EXACT join, no LSH false negatives (q21's banding trades
  * recall for speed; this operator trades nothing and is the
  * ground-truth producer MinHash calibration (q147) measures against).
  *
  * The scale path is the prefix-filtering principle: order every
  * shingle by ascending document frequency (rarest first, df rides the
  * one shuffle [[Shingles.hashesWithDf]] already pays), and for a set
  * of size s probe only its first p = s − ⌈τ·s⌉ + 1 tokens. Two sets
  * with J ≥ τ MUST share a token inside their prefixes (pigeonhole on
  * the overlap bound ⌈τ/(1+τ)·(sa+sb)⌉), so joining prefixes on the
  * token is a candidate generator with zero false negatives; a length
  * filter (min·1000 ≥ τ·max) prunes size-incompatible pairs before
  * verification. Verification re-joins only the CANDIDATE pairs to
  * their full hash sets — the quadratic shared-token blowup q23's
  * scaladoc warns about never happens because frequent tokens sit at
  * the back of every ordered set, outside the prefixes.
  *
  * The oracle is the brute-force all-pairs join with NO prefix filter,
  * so the hash gate cross-verifies the filter's exactness claim on the
  * real corpus, not just on a fixture. Global order = (df, hh): any
  * consistent total order keeps the theorem true; df-ascending is the
  * All-Pairs heuristic that makes prefixes rare. Integer throughout:
  * J ≥ τ is 1000·inter DIV union ≥ τ‰, exact for permille thresholds.
  */
object SetSimJoin {

  /** Jaccard threshold, permille. floor(1000·J) ≥ 500 ⇔ 2·inter ≥ union,
    * so the permille comparison is the exact rational test.
    */
  val Tau = 500L

  // ---------------------------------------------------------------- q173

  def q173(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    // (doc_id, h, df): per-doc-distinct shingle hashes with document
    // frequency — ONE corpus shuffle (on h), shared constructor.
    val grams = Shingles.hashesWithDf(docs).localCheckpoint()
    // Per-doc frequency-ordered set: sort by (df, h) — the global
    // total order — entirely WITHIN each doc's row (no global rank
    // pass, no single-partition window). p = s − ceil(τ·s) + 1.
    val ordered = grams
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("toks"),
        count(lit(1)).as("s"))
      .withColumn("p",
        col("s") - expr(s"($Tau * s + 999) DIV 1000") + lit(1L))
    val prefixes = ordered
      .select(col("doc_id"), col("s"),
        explode(expr("transform(slice(toks, 1, CAST(p AS INT)), t -> t.h)"))
          .as("h"))
    // Candidate pairs: a shared PREFIX token + the Jaccard length
    // filter. Distinct before verification.
    val cands = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.s"), col("b.s")) * 1000L >=
          greatest(col("a.s"), col("b.s")) * Tau)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.s").as("sa"), col("b.s").as("sb"))
      .distinct()
    // Verify candidates only: exact intersection over the full sets.
    val ga = grams.select(col("doc_id").as("doc_a"), col("h"))
    val gb = grams.select(col("doc_id").as("doc_b"), col("h"))
    cands
      .join(ga, Seq("doc_a"))
      .join(gb, Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("union_size", col("sa") + col("sb") - col("inter"))
      .withColumn("jaccard_permille", expr("1000 * inter DIV union_size"))
      .filter(col("jaccard_permille") >= Tau)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("union_size"),
        col("jaccard_permille"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q173Oracle: String =
    s"WITH ${Shingles.hashesCteSql},\n" +
    s"""sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM hs a JOIN hs b ON a.hh = b.hh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT p.doc_a, p.doc_b, CAST(p.inter AS BIGINT) AS inter,
       |       CAST(sa.n + sb.n - p.inter AS BIGINT) AS union_size,
       |       CAST(1000 * p.inter // (sa.n + sb.n - p.inter) AS BIGINT)
       |         AS jaccard_permille
       |FROM pairs p
       |JOIN sizes sa ON p.doc_a = sa.doc_id
       |JOIN sizes sb ON p.doc_b = sb.doc_id
       |WHERE 1000 * p.inter // (sa.n + sb.n - p.inter) >= $Tau
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q173_setsim_join" -> (q173 _))

  val oracles: Map[String, String] = Map(
    "q173_setsim_join" -> q173Oracle)
}
