package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** Tokenizer TRAINING support (q124) — the other half of the tokenizer
  * story: q116 audits a vocabulary's coverage; this computes the data a
  * BPE trainer consumes. The inner loop of BPE training is "count
  * adjacent symbol pairs weighted by word frequency, merge the top
  * pair, repeat" — at 100 TB the corpus-scale part is exactly one
  * word-count (scan + one shuffle), after which every merge round runs
  * on the BOUNDED word-frequency table (top [[BpeVocabWords]] words),
  * never touching the corpus again. The query materializes two rounds
  * to pin the iteration step itself, not just the first count:
  *
  *   round 1: adjacent char-pair counts over the top-W word-freq table;
  *   round 2: the winning pair is merged into a single marker symbol
  *            (`replace`, left-to-right non-overlapping in BOTH
  *            engines) and pairs are re-counted — merged-symbol
  *            adjacencies ('0x'/'x0') now compete like any other pair.
  *
  * All weights are exact int64 sums of int64 word frequencies; every
  * ranking uses the total order (weight DESC, pair ASC), so both
  * engines agree bit-for-bit.
  */
object TokenizerOps {

  /** Word-frequency table bound: BPE trains on frequencies of the top-W
    * words, not the raw corpus — the state a 1000-executor trainer
    * would broadcast. Total order (freq DESC, word ASC) as q116.
    */
  val BpeVocabWords: Int = 500

  /** Pairs reported per round. */
  val BpePairTop: Int = 30

  def q124(spark: SparkSession, dir: String): DataFrame = {
    val wf = table(spark, dir, "documents")
      .select(explode(expr(
        "filter(split(lower(text), '[^a-z]+'), w -> length(w) >= 2)"))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(BpeVocabWords)

    def pairCounts(words: DataFrame, round: Int): DataFrame =
      words
        .filter(length(col("word")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, length(word) - 1)," +
            " i -> substring(word, i, 2))")).as("pair"),
          col("word"))
        .groupBy(col("pair"))
        .agg(sum(col("freq")).as("weight"),
          count_distinct(col("word")).as("n_words"))
        .orderBy(col("weight").desc, col("pair"))
        .limit(BpePairTop)
        .select(lit(round).as("round"), col("pair"), col("weight"),
          col("n_words"))

    val r1 = pairCounts(wf, 1)
    val top1 = r1.orderBy(col("weight").desc, col("pair")).limit(1)
      .select(col("pair").as("merge_pair"))
    val merged = wf.crossJoin(broadcast(top1))
      .select(expr("replace(word, merge_pair, '0')").as("word"), col("freq"))
    val r2 = pairCounts(merged, 2)

    r1.unionAll(r2).orderBy(col("round"), col("weight").desc, col("pair"))
  }

  val q124Oracle: String =
    s"""WITH wf AS (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
       |                              w -> length(w) >= 2)) AS word
       |    FROM documents)
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $BpeVocabWords),
       |p1 AS (
       |  SELECT pair, CAST(sum(freq) AS BIGINT) AS weight,
       |         count(DISTINCT word) AS n_words
       |  FROM (
       |    SELECT word, freq, substring(word, i, 2) AS pair FROM (
       |      SELECT word, freq,
       |             unnest(generate_series(1, length(word) - 1)) AS i
       |      FROM wf WHERE length(word) >= 2))
       |  GROUP BY pair ORDER BY weight DESC, pair LIMIT $BpePairTop),
       |r1 AS (SELECT 1 AS round, pair, weight, n_words FROM p1),
       |top1 AS (SELECT pair FROM p1 ORDER BY weight DESC, pair LIMIT 1),
       |w2 AS (
       |  SELECT replace(word, (SELECT pair FROM top1), '0') AS word, freq
       |  FROM wf),
       |p2 AS (
       |  SELECT pair, CAST(sum(freq) AS BIGINT) AS weight,
       |         count(DISTINCT word) AS n_words
       |  FROM (
       |    SELECT word, freq, substring(word, i, 2) AS pair FROM (
       |      SELECT word, freq,
       |             unnest(generate_series(1, length(word) - 1)) AS i
       |      FROM w2 WHERE length(word) >= 2))
       |  GROUP BY pair ORDER BY weight DESC, pair LIMIT $BpePairTop),
       |r2 AS (SELECT 2 AS round, pair, weight, n_words FROM p2)
       |SELECT CAST(round AS INT) AS round, pair, weight, n_words
       |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
       |ORDER BY round, weight DESC, pair""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q124_bpe_pairs" -> (q124 _))

  val oracles: Map[String, String] = Map(
    "q124_bpe_pairs" -> q124Oracle)
}
