package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{sqlWithViews, table}
import graft.functions.CrossHash

/** q59-q62: second round-2 pack — bounded per-group sampling, text
  * normalization, token set algebra, and positional window functions.
  */
object PipelineOps2 {

  // ---------------------------------------------------------------- q59

  /** Deterministic bounded sample per group ("reservoir" without RNG
    * state): rank rows inside each language by a salted content hash and
    * keep the first 5. Retry-stable and partition-order independent —
    * at 100 TB this is the only sane way to take a fixed-size peek at
    * every group in one shuffle.
    */
  def q59(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(
        CrossHash.h60(concat(lit("rsv:"), col("doc_id").cast("string"))),
        col("doc_id"))
    table(spark, dir, "documents")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rk"))
  }

  val q59Oracle: String = {
    val h = CrossHash.h60Sql("'rsv:' || CAST(doc_id AS VARCHAR)")
    s"""SELECT lang, rk, doc_id, n_chars FROM (
       |  SELECT lang, doc_id, n_chars,
       |         CAST(row_number() OVER (PARTITION BY lang
       |                                 ORDER BY $h, doc_id) AS BIGINT) AS rk
       |  FROM documents)
       |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin
  }

  // ---------------------------------------------------------------- q60

  /** Text normalization for dedup/curation: lowercase, collapse
    * everything but [a-z0-9 ] to spaces, squeeze runs, trim — then
    * fingerprint the normal form and count its duplicates via a window.
    * The normalize chain is pure narrow projection (regex semantics
    * identical across engines for this ASCII character class); only the
    * dup-count shuffles, on the fingerprint.
    */
  def q60(spark: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    table(spark, dir, "documents")
      .withColumn("norm_md5", md5(norm))
      .withColumn("norm_len", length(norm).cast("long"))
      .withColumn("n_same_norm",
        count(lit(1)).over(Window.partitionBy(col("norm_md5"))))
      .select(col("doc_id"), col("lang"), col("norm_len"),
        col("norm_md5"), col("n_same_norm"))
      .orderBy(col("doc_id"))
  }

  val q60Oracle: String =
    """WITH n AS (
      |  SELECT doc_id, lang,
      |         trim(regexp_replace(regexp_replace(lower(text),
      |              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT doc_id, lang,
      |       CAST(length(norm) AS BIGINT) AS norm_len,
      |       md5(norm) AS norm_md5,
      |       count(*) OVER (PARTITION BY md5(norm)) AS n_same_norm
      |FROM n ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61

  /** Per-(lang, band) membership cap for q61's pair blocks — the
    * hot-bucket discipline ([[Dedup.MaxBucketDocs]]'s pattern): the
    * band count is bounded by the max document length, so WITHOUT a
    * cap each cell grows linearly with the corpus and the pair pass
    * is quadratic (round 9 measured 12× wall at 10× data). Capping
    * membership bounds every cell's pair fan-out at cap·(cap−1)/2;
    * the rank runs on exactly the join keys, so its exchange IS the
    * join's exchange. Mirrored verbatim in the oracle's QUALIFY.
    */
  private[graft] val Q61CellCap = 32

  /** Token-set algebra between same-language document pairs:
    * |A ∩ B|, |A ∪ B| and exact Jaccard from array_intersect/array_union
    * over deduplicated whitespace tokens. Sizes are exact ints; the
    * Jaccard is one int/int division — bit-equal across engines.
    *
    * Pairs are blocked on (lang, 50-char length band): near-dups have
    * similar lengths, so the band prunes ~10× of the quadratic work AND
    * multiplies the join-key cardinality — joining on lang alone puts
    * the whole dominant-language block in ONE reducer task (observed
    * 5.4 s at sf0.1, single straggler; banded: ~60 cells, 0.6 s).
    * Cell membership is bounded by [[Q61CellCap]] (lowest doc_ids keep
    * their seat — deterministic, oracle-mirrored), so total pair volume
    * is cells × cap², linear in the corpus at any scale.
    */
  def q61(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 50).cast("long").as("band"),
        array_distinct(split(lower(col("text")), " +")).as("toks"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), col("band")).orderBy(col("doc_id"))))
      .filter(col("rn") <= Q61CellCap)
      .drop("rn")
    val a = toks.toDF("id_a", "lang", "band", "toks_a")
    val b = toks.toDF("id_b", "lang_b", "band_b", "toks_b")
    a.join(b, col("lang") === col("lang_b") &&
        col("band") === col("band_b") && (col("id_a") < col("id_b")))
      .select(
        col("lang"), col("id_a"), col("id_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long")
          .as("n_inter"),
        size(array_union(col("toks_a"), col("toks_b"))).cast("long")
          .as("n_union"))
      .withColumn("jacc", col("n_inter") / col("n_union"))
      .orderBy(col("lang"), col("id_a"), col("id_b"))
  }

  val q61Oracle: String =
    s"""WITH t AS (
      |  SELECT doc_id, lang, CAST(floor(n_chars / 50) AS BIGINT) AS band,
      |         list_distinct(string_split_regex(lower(text), ' +')) AS toks
      |  FROM documents WHERE doc_id % 5 = 0
      |  QUALIFY row_number() OVER (PARTITION BY lang, band
      |                             ORDER BY doc_id) <= $Q61CellCap)
      |SELECT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
      |       CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT)
      |         AS n_union,
      |       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |         len(list_distinct(list_concat(a.toks, b.toks))) AS jacc
      |FROM t a JOIN t b
      |  ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
      |ORDER BY a.lang, id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q62

  /** Positional window functions q07/q08 don't cover: first_value,
    * last_value and nth_value — last/nth over the FULL frame (the
    * default running frame makes last_value just the current row, the
    * classic trap). Values are picked, not computed, so they stay raw.
    */
  def q62(spark: SparkSession, dir: String): DataFrame =
    sqlWithViews(spark, dir, "orders" -> "orders_v62")(
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       last_value(o_totalprice) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS last_price,
        |       nth_value(o_totalprice, 2) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |         AS second_price
        |FROM orders_v62
        |WHERE o_custkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)

  val q62Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |       first_value(o_totalprice) OVER w AS first_price,
      |       last_value(o_totalprice) OVER
      |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |         AS last_price,
      |       nth_value(o_totalprice, 2) OVER
      |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |         AS second_price
      |FROM orders
      |WHERE o_custkey % 100 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_group_sample" -> (q59 _),
    "q60_text_normalize" -> (q60 _),
    "q61_token_setops" -> (q61 _),
    "q62_window_positional" -> (q62 _))

  val oracles: Map[String, String] = Map(
    "q59_group_sample" -> q59Oracle,
    "q60_text_normalize" -> q60Oracle,
    "q61_token_setops" -> q61Oracle,
    "q62_window_positional" -> q62Oracle)
}
