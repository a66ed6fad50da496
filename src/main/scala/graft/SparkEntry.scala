package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2.4/§7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB-runnable twin in [[oracleSql]]
  * (hash-compared by the driver at sf0.01) unless the operator is not
  * SQL-expressible. Column names and types are aligned across the two
  * engines; every query ends in a total ORDER BY; float aggregates are
  * rounded before compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02(spark, "/root/testdata/sf0.001")

  /** The SINGLE registration list: each domain module contributes its
    * (queries, oracles) pair once; both public maps derive from it, so
    * a module can never be registered for execution but dropped from
    * the correctness gate (or vice versa). Adding a module = one line.
    */
  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (Relational.queries, Relational.oracles),
    (Relational2.queries, Relational2.oracles),
    (Relational3.queries, Relational3.oracles),
    (Relational4.queries, Relational4.oracles),
    (Relational5.queries, Relational5.oracles),
    (Relational6.queries, Relational6.oracles),
    (Relational7.queries, Relational7.oracles),
    (Relational8.queries, Relational8.oracles),
    (Relational9.queries, Relational9.oracles),
    (Relational10.queries, Relational10.oracles),
    (Relational11.queries, Relational11.oracles),
    (Relational12.queries, Relational12.oracles),
    (Relational13.queries, Relational13.oracles),
    (Relational14.queries, Relational14.oracles),
    (Relational15.queries, Relational15.oracles),
    (Relational16.queries, Relational16.oracles),
    (Similarity.queries, Similarity.oracles),
    (Similarity2.queries, Similarity2.oracles),
    (Similarity3.queries, Similarity3.oracles),
    (Similarity4.queries, Similarity4.oracles),
    (Dedup.queries, Dedup.oracles),
    (DedupAuditOps.queries, DedupAuditOps.oracles),
    (SetSimJoin.queries, SetSimJoin.oracles),
    (TextAnalysis.queries, TextAnalysis.oracles),
    (LexicalStats.queries, LexicalStats.oracles),
    (CorpusStats.queries, CorpusStats.oracles),
    (CorpusHygieneOps.queries, CorpusHygieneOps.oracles),
    (FingerprintOps.queries, FingerprintOps.oracles),
    (TokenizerOps.queries, TokenizerOps.oracles),
    (EmbeddingOps.queries, EmbeddingOps.oracles),
    (RetrievalOps.queries, RetrievalOps.oracles),
    (MixtureOps.queries, MixtureOps.oracles),
    (ReleaseOps.queries, ReleaseOps.oracles),
    (EvalOps.queries, EvalOps.oracles),
    (MonitoringOps.queries, MonitoringOps.oracles),
    (ImportanceOps.queries, ImportanceOps.oracles),
    (GraphRank.queries, GraphRank.oracles),
    (Events.queries, Events.oracles),
    (EventStats.queries, EventStats.oracles),
    (MultimodalQueries.queries, MultimodalQueries.oracles),
    (IntervalQueries.queries, IntervalQueries.oracles),
    (JsonQueries.queries, JsonQueries.oracles),
    (SourceSink.queries, SourceSink.oracles),
    (Advanced.queries, Advanced.oracles),
    (ChunkingOps.queries, ChunkingOps.oracles),
    (MergeOps.queries, MergeOps.oracles))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_grid_explode" -> (GridQueries.q14 _),
    "q15_radiation_rollup" -> (GridQueries.q15 _),
    "q16_tz_partition_key" -> (GridQueries.q16 _),
    "q76_spatial_bin" -> (GridQueries.q76 _),
    "q77_nearest_anchor" -> (GridQueries.q77 _),
  ) ++ packs.iterator.flatMap(_._1)

  def oracleSql: Map[String, String] = Map(
    "q14_grid_explode" -> GridQueries.q14Oracle,
    "q15_radiation_rollup" -> GridQueries.q15Oracle,
    "q16_tz_partition_key" -> GridQueries.q16Oracle,
    "q76_spatial_bin" -> GridQueries.q76Oracle,
    "q77_nearest_anchor" -> GridQueries.q77Oracle,
  ) ++ packs.iterator.flatMap(_._2)
}
