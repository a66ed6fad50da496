package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Executes every registered query at sf0.001 — catches analysis errors,
  * type mismatches, and empty results early. The full value-level oracle
  * compare runs via Verify + tools/check.py at sf0.01.
  */
class QuerySmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query ids are unique across packs (no silent map overwrite)") {
    // SparkEntry merges pack maps with ++ — a duplicated id would
    // silently drop one implementation and its oracle pairing
    val packs: Seq[(String, Iterable[String])] = Seq(
      "Relational" -> graft.queries.Relational.queries.keys,
      "Dedup" -> graft.queries.Dedup.queries.keys,
      "TextAnalysis" -> graft.queries.TextAnalysis.queries.keys,
      "Similarity" -> graft.queries.Similarity.queries.keys,
      "Events" -> graft.queries.Events.queries.keys,
      "Multimodal" -> graft.queries.MultimodalQueries.queries.keys,
      "Interval" -> graft.queries.IntervalQueries.queries.keys,
      "Relational2" -> graft.queries.Relational2.queries.keys,
      "Relational3" -> graft.queries.Relational3.queries.keys,
      "Relational4" -> graft.queries.Relational4.queries.keys,
      "Json" -> graft.queries.JsonQueries.queries.keys,
      "Similarity2" -> graft.queries.Similarity2.queries.keys,
      "Relational5" -> graft.queries.Relational5.queries.keys,
      "Advanced" -> graft.queries.Advanced.queries.keys,
      "ChunkingOps" -> graft.queries.ChunkingOps.queries.keys,
      "Relational6" -> graft.queries.Relational6.queries.keys,
      "Relational7" -> graft.queries.Relational7.queries.keys,
      "Relational8" -> graft.queries.Relational8.queries.keys,
      "Relational9" -> graft.queries.Relational9.queries.keys,
      "SourceSink" -> graft.queries.SourceSink.queries.keys,
      "MixtureOps" -> graft.queries.MixtureOps.queries.keys,
      "ReleaseOps" -> graft.queries.ReleaseOps.queries.keys,
      "GraphRank" -> graft.queries.GraphRank.queries.keys,
      "TokenizerOps" -> graft.queries.TokenizerOps.queries.keys,
      "Relational10" -> graft.queries.Relational10.queries.keys,
      "Relational11" -> graft.queries.Relational11.queries.keys,
      "Relational12" -> graft.queries.Relational12.queries.keys,
      "Relational13" -> graft.queries.Relational13.queries.keys,
      "Relational14" -> graft.queries.Relational14.queries.keys,
      "Similarity3" -> graft.queries.Similarity3.queries.keys,
      "Similarity4" -> graft.queries.Similarity4.queries.keys,
      "SetSimJoin" -> graft.queries.SetSimJoin.queries.keys,
      "Relational15" -> graft.queries.Relational15.queries.keys,
      "CorpusStats" -> graft.queries.CorpusStats.queries.keys,
      "LexicalStats" -> graft.queries.LexicalStats.queries.keys,
      "EventStats" -> graft.queries.EventStats.queries.keys,
      "Relational16" -> graft.queries.Relational16.queries.keys,
      "ImportanceOps" -> graft.queries.ImportanceOps.queries.keys,
      "MonitoringOps" -> graft.queries.MonitoringOps.queries.keys,
      "FingerprintOps" -> graft.queries.FingerprintOps.queries.keys,
      "EmbeddingOps" -> graft.queries.EmbeddingOps.queries.keys,
      "RetrievalOps" -> graft.queries.RetrievalOps.queries.keys,
      "EvalOps" -> graft.queries.EvalOps.queries.keys,
      "CorpusHygieneOps" -> graft.queries.CorpusHygieneOps.queries.keys,
      "DedupAuditOps" -> graft.queries.DedupAuditOps.queries.keys,
      "MergeOps" -> graft.queries.MergeOps.queries.keys)
    val grid = Seq("q14_grid_explode", "q15_radiation_rollup",
      "q16_tz_partition_key", "q76_spatial_bin", "q77_nearest_anchor")
    val all = grid ++ packs.flatMap(_._2)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query ids across packs: $dups")
    assert(all.size == SparkEntry.queries.size,
      s"pack total ${all.size} != merged ${SparkEntry.queries.size} — " +
        "a pack is missing from this guard or from SparkEntry")
  }

  test("every query id has an oracle or is explicitly oracle-free") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this list intentional: only engine-specific sketches/codecs
    assert(noOracle == Set("q38_approx_sketches", "q48_image_features",
      "q69_audio_features", "q93_heavy_hitters", "q112_image_resize",
      "q122_audio_resample", "q213_image_phash", "q226_image_dct_hash",
      "q258_audio_spectrum"),
      s"unexpected oracle-free queries: $noOracle")
  }

  test("every oracle string is non-null, non-empty, and SELECT-shaped") {
    // forces every module's oracle vals at once — an object-level val
    // that nests another val defined LATER in the same object reads
    // null during object init (the q163/q105Oracle trap found in the
    // round-11 consolidation); this test makes that class of bug a
    // build failure instead of a runtime surprise in one spec's JVM
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if sql == null => s"$name: null"
      case (name, sql) if sql.trim.isEmpty => s"$name: empty"
      case (name, sql) if sql.contains("null)") && sql.contains("FROM (null")
        => s"$name: nested-null"
      case (name, sql) if !sql.trim.toUpperCase.startsWith("SELECT") &&
        !sql.trim.toUpperCase.startsWith("WITH") => s"$name: not a query"
    }
    assert(bad.isEmpty, s"malformed oracles: $bad")
    // and no oracle silently swallowed a null nested fragment: a Scala
    // null interpolates as the exact LOWERCASE token `null`, while
    // legitimate SQL here spells the literal NULL uppercase and the
    // functions are single words (nullif/ifnull — no word boundary, so
    // \bnull\b can't match inside them). Lowercase `is [not] null`
    // predicates are excused by lookbehind. (ADVICE r11: the previous
    // guard excused any oracle merely CONTAINING 'nullif' — vacuous.)
    val nullTok = java.util.regex.Pattern.compile(
      "(?<!(?i:is) )(?<!(?i:is not) )(?<![\\w$])null(?![\\w$])")
    val nulled = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      val m = nullTok.matcher(sql)
      if (m.find()) {
        val ctx = sql.substring(math.max(0, m.start - 25),
          math.min(sql.length, m.end + 15)).replace('\n', ' ')
        Some(s"$name: ...$ctx...")
      } else None
    }
    assert(nulled.isEmpty,
      s"oracles embedding a stringified Scala null: $nulled")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  /** ADVICE r3→r5: SQL-formulated queries must not leave their temp
    * views in the session catalog (`Tables.sqlWithViews` drops them in
    * a finally). Build AND execute the judged set, then diff the
    * catalog — execution after the drop also proves `spark.sql`
    * resolved the plan eagerly, so the views were never load-bearing
    * past build time. The one deliberate session-level side effect is
    * the `nanosAsLong` read conf (documented in Tables.events).
    */
  test("sql-backed queries leave no temp views behind (session hygiene)") {
    def tempViews: Set[String] = spark.catalog.listTables().collect()
      .filter(_.isTemporary).map(_.name).toSet
    val before = tempViews
    Seq("q33_percentiles", "q79_regression_agg", "q80_hof_gauntlet",
      "q81_datetime_gauntlet", "q82_string_gauntlet",
      "q83_conditional_gauntlet", "q84_argmax")
      .foreach(n => SparkEntry.queries(n)(spark, sfDir).count())
    val leaked = tempViews -- before
    assert(leaked.isEmpty, s"leaked temp views: ${leaked.mkString(", ")}")
  }
}
