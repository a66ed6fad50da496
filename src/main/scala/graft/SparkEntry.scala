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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_grid_explode" -> (GridQueries.q14 _),
    "q15_radiation_rollup" -> (GridQueries.q15 _),
    "q16_tz_partition_key" -> (GridQueries.q16 _),
    "q76_spatial_bin" -> (GridQueries.q76 _),
    "q77_nearest_anchor" -> (GridQueries.q77 _),
  ) ++ Relational.queries ++ Dedup.queries ++ TextAnalysis.queries ++
    Similarity.queries ++ Events.queries ++ MultimodalQueries.queries ++
    IntervalQueries.queries ++ Relational2.queries ++ Relational3.queries ++ Relational4.queries ++ JsonQueries.queries ++ Similarity2.queries ++ Relational5.queries ++ Advanced.queries ++ Relational6.queries ++ Relational7.queries ++ Relational8.queries ++ Relational9.queries ++ SourceSink.queries ++ MixtureOps.queries ++ ReleaseOps.queries ++ GraphRank.queries ++ TokenizerOps.queries ++ Relational10.queries ++ Relational11.queries ++ Relational12.queries ++ Relational13.queries ++ Relational14.queries ++ Similarity3.queries ++ Similarity4.queries ++ SetSimJoin.queries ++ Relational15.queries ++ CorpusStats.queries ++ LexicalStats.queries ++ EventStats.queries ++ Relational16.queries ++ ImportanceOps.queries ++ MonitoringOps.queries ++ FingerprintOps.queries ++ EmbeddingOps.queries ++ RetrievalOps.queries ++ EvalOps.queries ++ CorpusHygieneOps.queries ++ DedupAuditOps.queries

  def oracleSql: Map[String, String] = Map(
    "q14_grid_explode" -> GridQueries.q14Oracle,
    "q15_radiation_rollup" -> GridQueries.q15Oracle,
    "q16_tz_partition_key" -> GridQueries.q16Oracle,
    "q76_spatial_bin" -> GridQueries.q76Oracle,
    "q77_nearest_anchor" -> GridQueries.q77Oracle,
  ) ++ Relational.oracles ++ Dedup.oracles ++ TextAnalysis.oracles ++
    Similarity.oracles ++ Events.oracles ++ MultimodalQueries.oracles ++
    IntervalQueries.oracles ++ Relational2.oracles ++ Relational3.oracles ++ Relational4.oracles ++ JsonQueries.oracles ++ Similarity2.oracles ++ Relational5.oracles ++ Advanced.oracles ++ Relational6.oracles ++ Relational7.oracles ++ Relational8.oracles ++ Relational9.oracles ++ SourceSink.oracles ++ MixtureOps.oracles ++ ReleaseOps.oracles ++ GraphRank.oracles ++ TokenizerOps.oracles ++ Relational10.oracles ++ Relational11.oracles ++ Relational12.oracles ++ Relational13.oracles ++ Relational14.oracles ++ Similarity3.oracles ++ Similarity4.oracles ++ SetSimJoin.oracles ++ Relational15.oracles ++ CorpusStats.oracles ++ LexicalStats.oracles ++ EventStats.oracles ++ Relational16.oracles ++ ImportanceOps.oracles ++ MonitoringOps.oracles ++ FingerprintOps.oracles ++ EmbeddingOps.oracles ++ RetrievalOps.oracles ++ EvalOps.oracles ++ CorpusHygieneOps.oracles ++ DedupAuditOps.oracles
}
