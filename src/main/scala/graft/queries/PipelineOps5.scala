package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.table
import graft.functions.CrossHash

/** q95-q99: round-6 widening — the two remaining self-describing
  * file formats under the oracle gate (ORC, XML), and three corpus
  * operators a training-data pipeline runs daily: RAG-style sliding
  * -window chunking, TF-IDF characteristic terms, and PMI collocation
  * mining.
  *
  * The scoring queries (q97/q98) follow the engine's quantization
  * contract (SURVEY §2.3, same discipline as q94's k-means): every
  * ranking key is an INTEGER derived with integer division, so Spark
  * and DuckDB rank identically by construction — no cross-engine
  * float comparison ever decides an output row.
  */
object PipelineOps5 {

  /** Stable scratch root per sink (same rationale as SourceSink:
    * fresh temp dirs leaked one /tmp entry per run, ADVICE r3).
    */
  private def scratchDir(name: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_scratch", name)
    Files.createDirectories(p.getParent)
    p.toString
  }

  // ---------------------------------------------------------------- q95

  /** ORC round-trip under the oracle gate, with a PARTITIONED sink:
    * project lossless columns of `orders`, write ORC partitioned by
    * o_orderstatus, read the tree back (partition-column recovery from
    * directory names included), and aggregate. The oracle runs the
    * same aggregate over the original parquet — equality certifies the
    * ORC sink/source pair AND the hive-style partition layout end to
    * end. Floats deliberately excluded (q85's CSV rationale).
    *
    * Scale shape: the write is a narrow scan fanned out by partition
    * value (one directory per status — low cardinality, no shuffle
    * added); the read-back prunes nothing here but would prune on any
    * status predicate; the aggregate is partial+final on a 15-key
    * domain.
    */
  def q95(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("orc_rt")
    table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").orc(out)
    spark.read.orc(out)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("key_sum"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  val q95Oracle: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
      |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
      |FROM orders
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q96

  /** Sliding-window document chunking — the RAG/pretraining splitter:
    * window of [[ChunkW]] whitespace tokens advancing by [[ChunkS]]
    * (8-token overlap), one output row per chunk with its 60-bit
    * content hash. The trailing chunk keeps whatever tokens remain
    * (standard chunker behavior; it is never empty because starts stop
    * at the last token index).
    *
    * Scale shape: pure narrow map — split, sequence, explode, slice,
    * hash; no shuffle before the final order-by (which the driver's
    * compare needs, not the operator). Chunk count per doc is
    * ceil(n/S) ≤ n, so output is O(corpus tokens) with no blowup.
    */
  val ChunkW = 32
  val ChunkS = 24

  def q96(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - 1, $ChunkS)")).as("start"))
      .select(col("doc_id"),
        (col("start") / ChunkS).cast("long").as("chunk_id"),
        expr(s"slice(toks, start + 1, $ChunkW)").as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tok"),
        CrossHash.h60(array_join(col("chunk"), " ")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val q96Oracle: String = {
    val slice = s"list_slice(toks, start + 1, start + $ChunkW)"
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, toks,
       |         unnest(range(0, len(toks), $ChunkS)) AS start
       |  FROM t WHERE len(toks) > 0)
       |SELECT doc_id,
       |       CAST(start / $ChunkS AS BIGINT) AS chunk_id,
       |       CAST(len($slice) AS BIGINT) AS n_tok,
       |       ${CrossHash.h60Sql(s"array_to_string($slice, ' ')")} AS chunk_hash
       |FROM s ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ---------------------------------------------------------------- q97

  /** Per-document characteristic terms by TF-IDF, top 3 for every 10th
    * doc (document frequencies always computed over the FULL corpus).
    * The idf is integer-quantized — idf_q = (10^6 · N) div df — so the
    * score tf·idf_q is a BIGINT and both engines rank identically;
    * ties break on the term string. Monotone in the real tf·ln(N/df)
    * up to quantization, which is the point: reproducible curation
    * beats a 15th decimal of idf.
    *
    * Scale shape: tf is one partial+final aggregate on (doc_id, term);
    * df reuses tf's output keyed on term (second small shuffle); N is
    * a 1-row broadcast, never a driver value; the ranking window runs
    * only over the sampled docs. Overflow headroom: score ≤
    * tf · 10^6 · N ≤ 2^62 while tf·N ≤ 4.6 × 10^12 — at 10^8 docs
    * that allows tf 46k, far beyond any real document; breach raises
    * via the same guard style as q84.
    */
  def q97(spark: SparkSession, dir: String): DataFrame = {
    val tf = table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = table(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    // the guard lives INSIDE the score expression (q84's pattern) — a
    // standalone guard column would be dead code under column pruning.
    // Bound: score <= tf·10⁶·N must stay < 2⁶², so tf·N < 2⁶²/10⁶
    val scored = tf.filter(col("doc_id") % 10 === 0)
      .join(df_, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        when(col("tf") * col("n_docs") > 4611686018427L,
          raise_error(lit("q97: tf*N breaches the 2^62 score budget"))
            .cast("long"))
          .otherwise(expr("tf * ((1000000 * n_docs) DIV df)")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("term"),
        col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rn"))
  }

  val q97Oracle: String =
    """WITH tf AS (
      |  SELECT doc_id, tok AS term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) t
      |  WHERE tok <> '' GROUP BY doc_id, tok),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |         tf.tf * ((1000000 * n.n_docs) // df.df) AS score
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |  WHERE tf.doc_id % 10 = 0),
      |ranked AS (
      |  SELECT doc_id, term, tf, df, score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, term) AS rn
      |  FROM scored)
      |SELECT doc_id, rn, term, tf, df, score
      |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- q98

  /** PMI collocation mining: top-20 word bigrams by pointwise mutual
    * information, min count 5. Because the corpus totals U (unigrams)
    * and T (bigrams) are CONSTANT across candidates, ranking by
    * pmi = ln(c_ab·U²/(c_a·c_b·T)) is exactly ranking by
    * c_ab/(c_a·c_b) — computed as the integer
    * ratio_q = (10^9 · c_ab) div (c_a · c_b), so the rank order is
    * bit-identical cross-engine and no float ever decides the cut.
    * Ties break (c_ab desc, bigram asc).
    *
    * Scale shape: unigram and bigram counts are partial+final
    * aggregates; the two enrichment joins key on single tokens (the
    * unigram side is vocabulary-sized — Zipf-small relative to the
    * corpus, and AQE broadcasts it when it fits); top-20 is
    * TakeOrderedAndProject. Overflow: 10^9·c_ab stays under 2^62
    * while c_ab ≤ 4.6 × 10^9 — a single bigram occurring 4.6 billion
    * times; c_a·c_b ≤ U² overflows only past U = 3 × 10^9 distinct
    * token OCCURRENCES of the same unigram pair, both far beyond the
    * design envelope and guarded in the spec's headroom note.
    */
  val PmiMinCount = 5

  def q98(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
    val uni = toks
      .select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val big = toks
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS ta, toks[i+1] AS tb))"))
        .as("bg"))
      .select(col("bg.ta"), col("bg.tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= PmiMinCount)
    big
      .join(uni.withColumnRenamed("tok", "ta").withColumnRenamed("c", "c_a"), "ta")
      .join(uni.withColumnRenamed("tok", "tb").withColumnRenamed("c", "c_b"), "tb")
      .withColumn("ratio_q",
        expr("(1000000000 * c_ab) DIV (c_a * c_b)"))
      .select(col("ta"), col("tb"), col("c_ab"), col("c_a"), col("c_b"),
        col("ratio_q"))
      .orderBy(col("ratio_q").desc, col("c_ab").desc, col("ta"), col("tb"))
      .limit(20)
  }

  val q98Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE tok <> ''),
       |uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       |pairs AS (
       |  SELECT tok AS ta, lead(tok, 1) OVER w AS tb
       |  FROM toks
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |big AS (
       |  SELECT ta, tb, count(*) AS c_ab FROM pairs
       |  WHERE tb IS NOT NULL GROUP BY ta, tb
       |  HAVING count(*) >= $PmiMinCount)
       |SELECT big.ta, big.tb, big.c_ab,
       |       ua.c AS c_a, ub.c AS c_b,
       |       (1000000000 * big.c_ab) // (ua.c * ub.c) AS ratio_q
       |FROM big
       |JOIN uni ua ON big.ta = ua.tok
       |JOIN uni ub ON big.tb = ub.tok
       |ORDER BY ratio_q DESC, c_ab DESC, ta, tb LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q99

  /** XML round-trip under the oracle gate (Spark 4's built-in XML
    * source): project lossless customer columns — including '#'- and
    * ','-bearing names that exercise element escaping — write with an
    * explicit rowTag, read back with an explicit schema, aggregate by
    * nation. The oracle aggregates the original parquet; equality
    * certifies the XML sink/source pair end to end. Same float
    * exclusion as q85/q95.
    */
  def q99(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir("xml_rt")
    table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"))
      .write.mode("overwrite").format("xml")
      .option("rootTag", "customers").option("rowTag", "customer")
      .save(out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_mktsegment", StringType),
      StructField("c_nationkey", LongType)))
    spark.read.format("xml").option("rowTag", "customer").schema(schema)
      .load(out)
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("c_custkey")).as("key_sum"),
        sum(length(col("c_name"))).cast("bigint").as("name_chars"),
        countDistinct(col("c_mktsegment")).as("n_segs"))
      .orderBy(col("c_nationkey"))
  }

  val q99Oracle: String =
    """SELECT c_nationkey, count(*) AS n,
      |       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |       CAST(sum(length(c_name)) AS BIGINT) AS name_chars,
      |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segs
      |FROM customer
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q100

  /** End-to-end curation funnel in ONE scan — the composition
    * showpiece: quality gate → normalized-fingerprint dedup (keep the
    * lowest doc_id among quality survivors) → deterministic 80%
    * sample, reported as per-stage survivor stats (stage 0 ingested,
    * 1 quality-passed, 2 deduped, 3 sampled).
    *
    * Every decision is integer-only (token/char counts, a 60-bit
    * cross-engine hash for both the fingerprint and the sample
    * bucket), so the funnel is bit-reproducible and resumable — the
    * q56 argument, applied to the whole pipeline. Each doc gets the
    * furthest stage it reached via one fingerprint window (running
    * count of earlier quality survivors — no self-join), then
    * explodes onto stages 0..label so a single partial+final
    * aggregate yields the funnel. Scale shape: one corpus scan, one
    * window shuffle on the 8-byte fingerprint, a ≤4-row result;
    * at 100 TB this is the shape you want (the alternative — one
    * filter+count action per stage — rescans the corpus four times).
    */
  def q100(spark: SparkSession, dir: String): DataFrame = {
    val flags = table(spark, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_tokens",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in')))")
          .cast("long"))
      .withColumn("qual_ok",
        col("n_tokens") >= 15 && length(col("text")) >= 80 &&
          length(col("text")) <= 5000 &&
          col("stop_tokens") * 10 <= col("n_tokens") * 6)
      .withColumn("fp",
        // explicit whitespace class: Java's \s and RE2's \s disagree on
        // \x0B, and the fingerprint must be bit-identical cross-engine
        CrossHash.h60(regexp_replace(lower(col("text")), "[ \t\n\r]+", " ")))
      .withColumn("smp",
        CrossHash.h60(concat(lit("cur:"), col("doc_id").cast("string"))) % 100)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    flags
      .withColumn("n_prior",
        coalesce(sum(when(col("qual_ok"), 1L).otherwise(0L)).over(w), lit(0L)))
      .withColumn("label",
        when(!col("qual_ok"), 0)
          .when(col("n_prior") > 0, 1)
          .when(col("smp") >= 80, 2)
          .otherwise(3))
      .select(col("doc_id"), col("n_tokens"),
        explode(expr("sequence(0, label)")).as("stage_i"))
      .select(col("doc_id"), col("n_tokens"),
        col("stage_i").cast("long").as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_sum"),
        sum(col("n_tokens")).as("tok_sum"))
      .orderBy(col("stage"))
  }

  val q100Oracle: String = {
    val fp = CrossHash.h60Sql(
      "regexp_replace(lower(text), '[ \\t\\n\\r]+', ' ', 'g')")
    val smp = CrossHash.h60Sql("'cur:' || CAST(doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |         len(list_filter(string_split(text, ' '), t -> t <> ''))
       |           AS n_tokens,
       |         length(text) AS n_chars,
       |         len(list_filter(string_split(text, ' '),
       |             t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS stop_tokens
       |  FROM documents),
       |flags AS (
       |  SELECT doc_id, n_tokens,
       |         (n_tokens >= 15 AND n_chars >= 80 AND n_chars <= 5000
       |          AND stop_tokens * 10 <= n_tokens * 6) AS qual_ok,
       |         $fp AS fp,
       |         ($smp) % 100 AS smp
       |  FROM base),
       |ranked AS (
       |  SELECT *, coalesce(sum(CASE WHEN qual_ok THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY fp ORDER BY doc_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           0) AS n_prior
       |  FROM flags),
       |lab AS (
       |  SELECT doc_id, n_tokens,
       |         CASE WHEN NOT qual_ok THEN 0
       |              WHEN n_prior > 0 THEN 1
       |              WHEN smp >= 80 THEN 2 ELSE 3 END AS label
       |  FROM ranked),
       |expanded AS (
       |  SELECT unnest(generate_series(0, label)) AS stage, doc_id, n_tokens
       |  FROM lab)
       |SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_docs,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       CAST(sum(n_tokens) AS BIGINT) AS tok_sum
       |FROM expanded GROUP BY stage ORDER BY stage""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_orc_roundtrip" -> (q95 _),
    "q96_doc_chunks" -> (q96 _),
    "q97_tfidf_topk" -> (q97 _),
    "q98_pmi_bigrams" -> (q98 _),
    "q99_xml_roundtrip" -> (q99 _),
    "q100_curation_funnel" -> (q100 _))

  val oracles: Map[String, String] = Map(
    "q95_orc_roundtrip" -> q95Oracle,
    "q96_doc_chunks" -> q96Oracle,
    "q97_tfidf_topk" -> q97Oracle,
    "q98_pmi_bigrams" -> q98Oracle,
    "q99_xml_roundtrip" -> q99Oracle,
    "q100_curation_funnel" -> q100Oracle)
}
