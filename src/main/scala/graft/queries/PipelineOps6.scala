package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.table
import graft.functions.{CrossHash, VectorOps}

/** q101-q105: round-6 second widening — five operators a training-data
  * platform runs between ingestion and export, each oracle-gated:
  *
  *  - q101 cross-document repeated-passage detection (chunk-level exact
  *    dedup — the Lee et al. 2021 "Deduplicating Training Data" shape,
  *    tiled chunks instead of suffix arrays, which is the form that
  *    distributes);
  *  - q102 per-source quota sampling (mixture balancing);
  *  - q103 recall@k evaluation of the q42 sign-LSH index against the
  *    exact top-k — the index-quality harness;
  *  - q104 capped inverted-index (posting-list) construction;
  *  - q105 integer-quantized BM25 retrieval.
  *
  * Scoring queries follow the engine's quantization contract (q94/q97
  * discipline): every ranking key is a BIGINT derived with integer
  * division, so Spark and DuckDB rank identically by construction.
  */
object PipelineOps6 {

  // ---------------------------------------------------------------- q101

  /** Cross-document repeated-passage detection: hash EVERY [[RpW]]-token
    * window (stride 1, the native digest-streaming [[WordShingles60]])
    * and report the top 50 window hashes that appear in ≥ 2 distinct
    * documents. Stride 1 is what makes the detector alignment-invariant
    * — a shared run of L ≥ W tokens produces L−W+1 colliding windows in
    * each copy no matter where the run sits in either document. (The
    * cheaper non-overlapping tiling halves the hash count but only
    * catches copies at offsets congruent mod W — a first draft of this
    * query did exactly that, and its own spec's misaligned-run fixture
    * refuted it.) This is the distributable stand-in for suffix-array
    * substring dedup (Lee et al. 2021): passage granularity, bounded
    * state, no global sort.
    *
    * Scale shape: narrow split→shingle→hash map with no pre-shuffle and
    * no intermediate shingle strings (the native expression streams
    * token bytes straight into the digest), ONE partial+final aggregate
    * on 8-byte keys, top-50 via TakeOrderedAndProject. Output is
    * bounded by the limit; aggregate state by the distinct-window
    * domain, never by document sizes.
    */
  val RpW = 16

  def q101(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= RpW)
      .select(col("doc_id"),
        explode(
          graft.functions.WordShingles60.wordShingles60(col("toks"), RpW))
          .as("chunk_hash"))
      .groupBy(col("chunk_hash"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_occ").desc, col("n_docs").desc, col("chunk_hash"))
      .limit(50)

  val q101Oracle: String = {
    val leads = (1 until RpW)
      .map(j => s"|| ' ' || lead(tok, $j) OVER w ").mkString
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id,
       |           unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t
       |  WHERE tok <> ''),
       |sh AS (
       |  SELECT doc_id, tok $leads AS shingle
       |  FROM toks
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |c AS (
       |  SELECT doc_id, ${CrossHash.h60Sql("shingle")} AS chunk_hash
       |  FROM sh WHERE shingle IS NOT NULL),
       |g AS (
       |  SELECT chunk_hash,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |         count(*) AS n_occ,
       |         CAST(min(doc_id) AS BIGINT) AS first_doc
       |  FROM c GROUP BY chunk_hash
       |  HAVING count(DISTINCT doc_id) >= 2)
       |SELECT chunk_hash, n_docs, n_occ, first_doc
       |FROM g ORDER BY n_occ DESC, n_docs DESC, chunk_hash LIMIT 50""".stripMargin
  }

  // ---------------------------------------------------------------- q102

  /** Per-source quota sampling — the mixture balancer: every source
    * contributes at most [[MixQuota]] documents, selected by a
    * deterministic hash rank (so the subset is stable under reruns and
    * independent of input order), reported as per-source totals vs kept
    * stats. This is how a pretraining mix caps an over-represented
    * domain without a random() that would differ per engine and per
    * run.
    *
    * Scale shape: totals are one partial+final aggregate; the quota
    * rank is a row_number filtered to ≤ quota, which Spark plans with
    * WindowGroupLimit pushdown — each map partition forwards at most
    * `quota` rows per source to the window exchange, so the shuffle
    * carries O(quota × partitions) per source, NOT the corpus. The
    * totals-side join key (source) is low-cardinality and tiny — AQE
    * broadcasts it.
    */
  val MixQuota = 10

  def q102(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n_tokens"))
    val totals = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"), sum(col("n_tokens")).as("tok_total"))
    val w = Window.partitionBy(col("source"))
      .orderBy(
        CrossHash.h60(concat(lit("mix:"), col("doc_id").cast("string"))),
        col("doc_id"))
    val kept = docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= MixQuota)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("kept_id_sum"),
        sum(col("n_tokens")).as("kept_tok_sum"))
    totals.join(kept, "source")
      .select(col("source"), col("n_total"), col("tok_total"),
        col("n_kept"), col("kept_id_sum"), col("kept_tok_sum"))
      .orderBy(col("source"))
  }

  val q102Oracle: String = {
    val h = CrossHash.h60Sql("'mix:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
       |              AS BIGINT) AS n_tokens
       |  FROM documents),
       |tot AS (
       |  SELECT source, count(*) AS n_total,
       |         CAST(sum(n_tokens) AS BIGINT) AS tok_total
       |  FROM d GROUP BY source),
       |rk AS (
       |  SELECT source, doc_id, n_tokens,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY $h, doc_id) AS rk
       |  FROM d),
       |kept AS (
       |  SELECT source, count(*) AS n_kept,
       |         CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
       |         CAST(sum(n_tokens) AS BIGINT) AS kept_tok_sum
       |  FROM rk WHERE rk <= $MixQuota GROUP BY source)
       |SELECT tot.source, n_total, tok_total, n_kept, kept_id_sum,
       |       kept_tok_sum
       |FROM tot JOIN kept USING (source) ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q103

  /** Recall@k evaluation of the q42 sign-LSH index: for a probe subset,
    * compare the index's candidate set (band-bucket collisions, via the
    * SAME [[Similarity2.signBands]] the index itself uses) against the
    * exact cosine top-[[RecallK]] over the sample, and report per-probe
    * candidate count, hit count, and integer recall percent. An ANN
    * index you cannot grade is an ANN index you cannot tune — this is
    * the harness that turns q42's band parameters into a measured
    * recall/cost trade.
    *
    * Scale shape: the exact side is the EVALUATION, not the serving
    * path — the probe panel is CAPPED ([[RecallPanelCap]] on the id
    * domain), so its size is a constant, not a corpus fraction, and
    * the exact pass costs O(panel × corpus) = one broadcast-probe
    * corpus scan no matter the scale (an uncapped %-sampled panel made
    * the evaluation quadratic — the sf1 headroom run measured 100×
    * pair growth at 10× data and this cap is the fix). The candidate
    * side is the bucketed join (never all-pairs); hits are a semi-join
    * of two probe-keyed sets.
    */
  val RecallK = 10
  val RecallPanelCap = 4000L

  def q103(spark: SparkSession, dir: String): DataFrame = {
    val sample = table(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
    val probes = sample
      .filter(col("vec_id") % 20 === 0 && col("vec_id") < RecallPanelCap)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    // the ranking key is floor(sim·10⁶): an exact integer from the same
    // IEEE double both engines fold in the same order — floor has no
    // HALF_UP boundary ambiguity, unlike round(), so this honors the
    // module header's BIGINT-ranking-key contract
    val exactTop = broadcast(probes)
      .crossJoin(sample.select(
        col("vec_id").as("neighbor_id"), col("embedding").as("ce")))
      .filter(col("neighbor_id") =!= col("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        floor(VectorOps.cosineNative(col("pe"), col("ce")) * lit(1000000d))
          .cast("long").as("sim_q"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("sim_q").desc, col("neighbor_id"))))
      .filter(col("rnk") <= RecallK)
      .select(col("probe_id"), col("neighbor_id"))
    val bands = Similarity2.signBands(sample)
    // the probe-side bands are ≤ 4×panel rows (the cap again) —
    // broadcast them so the corpus-side bands never shuffle; pairing
    // goes through the shared Similarity2.bucketPairs predicate
    val cand = Similarity2.bucketPairs(
      broadcast(bands.filter(
        col("vec_id") % 20 === 0 && col("vec_id") < RecallPanelCap)),
      bands)
      .select(col("va").as("probe_id"), col("vb").as("neighbor_id"))
    val nCand = cand.groupBy(col("probe_id")).agg(count(lit(1)).as("n_cand"))
    // exactTop is ≤ panel×k rows by construction — broadcast the hits join
    val nHits = broadcast(exactTop).join(cand, Seq("probe_id", "neighbor_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hits"))
    // both aggregates are ≤ |panel| rows — broadcast, don't sort-merge
    probes.select(col("probe_id"))
      .join(broadcast(nCand), Seq("probe_id"), "left")
      .join(broadcast(nHits), Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(coalesce(n_hits, 0L) * 100) DIV $RecallK").as("recall_pct"))
      .orderBy(col("probe_id"))
  }

  val q103Oracle: String =
    s"""WITH sample AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0),
       |${Similarity2.bandsCtesSql},
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pe
       |  FROM sample WHERE vec_id % 20 = 0 AND vec_id < $RecallPanelCap),
       |pairs AS (
       |  SELECT p.probe_id AS pid, s.vec_id AS nid, p.pe, s.embedding AS ne
       |  FROM probes p JOIN sample s ON s.vec_id <> p.probe_id),
       |un AS (
       |  SELECT pid, nid, CAST(unnest(pe) AS DOUBLE) AS x,
       |         CAST(unnest(ne) AS DOUBLE) AS y
       |  FROM pairs),
       |sims AS (
       |  SELECT pid, nid,
       |         CAST(floor(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y)))
       |                    * 1000000) AS BIGINT) AS sim_q
       |  FROM un GROUP BY pid, nid),
       |exact AS (
       |  SELECT pid, nid,
       |         row_number() OVER (PARTITION BY pid
       |                            ORDER BY sim_q DESC, nid) AS rnk
       |  FROM sims),
       |topk AS (SELECT pid, nid FROM exact WHERE rnk <= $RecallK),
       |${Similarity2.candCteSql(
            s"WHERE a.vec_id % 20 = 0 AND a.vec_id < $RecallPanelCap")},
       |ncand AS (SELECT va, count(*) AS n_cand FROM cand GROUP BY va),
       |nhits AS (
       |  SELECT t.pid, count(*) AS n_hits
       |  FROM topk t JOIN cand c ON t.pid = c.va AND t.nid = c.vb
       |  GROUP BY t.pid)
       |SELECT p.probe_id,
       |       CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
       |       CAST(coalesce(nh.n_hits, 0) AS BIGINT) AS n_hits,
       |       CAST((coalesce(nh.n_hits, 0) * 100) // $RecallK AS BIGINT)
       |         AS recall_pct
       |FROM probes p
       |LEFT JOIN ncand nc ON p.probe_id = nc.va
       |LEFT JOIN nhits nh ON p.probe_id = nh.pid
       |ORDER BY p.probe_id""".stripMargin

  // ---------------------------------------------------------------- q104

  /** Capped inverted-index construction: for every term with document
    * frequency ≥ [[IdxMinDf]], emit (term, df, first [[IdxPostCap]]
    * doc_ids ascending). The posting cap is the point — a retrieval
    * index ships bounded postings per shard, and an uncapped
    * collect_list over a Zipf head term is the classic executor OOM.
    *
    * Scale shape: per-document term dedup happens map-side
    * (array_distinct before explode — no (doc, term) distinct shuffle);
    * df is one partial+final aggregate; the posting rank is a
    * row_number ≤ cap, so WindowGroupLimit forwards at most `cap` rows
    * per term per map partition to the exchange and the collect_list
    * state is ≤ cap entries per term BY CONSTRUCTION.
    */
  val IdxMinDf = 25
  val IdxPostCap = 8

  def q104(spark: SparkSession, dir: String): DataFrame = {
    val pairs = table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(expr(
          "array_distinct(filter(split(text, ' '), t -> t <> ''))"))
          .as("term"))
    val dfreq = pairs.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= IdxMinDf)
    val postings = pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("doc_id"))))
      .filter(col("rn") <= IdxPostCap)
      .groupBy(col("term"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postingArr"))
    // The posting list is emitted as a space-joined string, not a raw
    // array column: the output contract is scalar-only columns so any
    // row-set comparator (hash, sort, pandas) can digest it. The
    // array-form semantics (sorted, capped, distinct) are pinned by
    // PipelineOps6Spec against the split of this string.
    dfreq.join(postings, "term")
      .select(col("term"), col("df"),
        array_join(col("postingArr"), " ").as("posting"))
      .orderBy(col("term"))
  }

  val q104Oracle: String =
    s"""WITH pairs AS (
       |  SELECT DISTINCT doc_id, tok AS term FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents) t
       |  WHERE tok <> ''),
       |df AS (
       |  SELECT term, count(*) AS df FROM pairs
       |  GROUP BY term HAVING count(*) >= $IdxMinDf),
       |rk AS (
       |  SELECT term, doc_id,
       |         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
       |  FROM pairs),
       |pl AS (
       |  SELECT term,
       |         array_to_string(list(doc_id ORDER BY doc_id), ' ') AS posting
       |  FROM rk WHERE rn <= $IdxPostCap GROUP BY term)
       |SELECT df.term, df.df, pl.posting
       |FROM df JOIN pl USING (term) ORDER BY df.term""".stripMargin

  // ---------------------------------------------------------------- q105

  /** Integer-quantized BM25 retrieval: top-[[BmK]] documents for a
    * fixed conjunctive-OR term query. With k1 = 1.2, b = 0.75 the
    * per-term score tf·(k1+1)·idf / (tf + k1·(1−b+b·dl/avgdl)) clears
    * to the integer rational
    *
    *   s_q = (22 · tf · avgdl · idf_q) DIV (10·avgdl·tf + 3·avgdl + 9·dl)
    *
    * with idf_q = (10⁴·N) DIV df (q97's quantized-idf discipline —
    * monotone in the real idf, reproducible everywhere), so the ranking
    * key sum(s_q) is a BIGINT both engines compute bit-identically.
    * Overflow is guarded in-expression (q84/q97 pattern): the numerator
    * must stay < 2⁶², i.e. tf·idf_q < 2⁶²/(22·avgdl) — breach raises,
    * never wraps.
    *
    * Scale shape: the term filter prunes the explode to the query
    * vocabulary BEFORE the (doc, term) aggregate, so no shuffle ever
    * carries more than the matching postings; df (≤ |query| rows) and
    * the corpus stats (1 row) broadcast; top-k is
    * TakeOrderedAndProject. The plan reads the corpus once for tf and
    * once each for the df/avgdl statistics — self-contained here so the
    * oracle gates the whole computation; a production deployment serves
    * (N, avgdl, df) from index metadata (one precomputed aggregate,
    * reused by every query), making the per-query cost a single scan.
    */
  val BmTerms: Seq[String] = Seq("data", "join", "stream", "filter")
  val BmK = 10

  def q105(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("dl"))
      .filter(col("dl") > 0)
    val stats = docs
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tok_sum"))
      .select(col("n_docs"), expr("tok_sum DIV n_docs").as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(BmTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_q", expr("(10000 * n_docs) DIV df"))
      // guard arithmetic must itself be overflow-free in ANY mode: the
      // threshold is a pure integer-division chain (never multiplies
      // user-scaled values), conservative by one floor step — it can
      // raise a hair early, never late, and never wraps
      .withColumn("s_q",
        when(col("tf") >
            expr("4611686018427387904 DIV (22 * avgdl) DIV idf_q"),
          raise_error(lit("q105: tf*idf_q breaches the 2^62 score budget"))
            .cast("long"))
          .otherwise(expr(
            "(22 * tf * avgdl * idf_q) DIV (10 * avgdl * tf + 3 * avgdl + 9 * dl)")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("s_q")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(BmK)
      .select(col("doc_id"), col("n_terms"), col("score"))
  }

  val q105Oracle: String = {
    val termList = BmTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents),
       |dd AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
       |  FROM d WHERE len(toks) > 0),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) // count(*) AS avgdl
       |  FROM dd),
       |tf AS (
       |  SELECT doc_id, dl, tok AS term, count(*) AS tf FROM (
       |    SELECT doc_id, dl, unnest(toks) AS tok FROM dd) t
       |  WHERE tok IN ($termList) GROUP BY doc_id, dl, tok),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc AS (
       |  SELECT tf.doc_id,
       |         (22 * tf.tf * s.avgdl * ((10000 * s.n_docs) // df.df))
       |           // (10 * s.avgdl * tf.tf + 3 * s.avgdl + 9 * tf.dl) AS s_q
       |  FROM tf JOIN df USING (term) CROSS JOIN stats s)
       |SELECT doc_id, count(*) AS n_terms, CAST(sum(s_q) AS BIGINT) AS score
       |FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $BmK""".stripMargin
  }

  // ---------------------------------------------------------------- q126

  /** Docs returned by the phrase search. */
  val PhraseTop = 50

  /** Positional phrase search — the retrieval primitive q104's postings
    * and q105's ranking both lack: CONSECUTIVE-position matching. The
    * query phrase is derived from the corpus itself (its most frequent
    * bigram under the total order count DESC, w1, w2 — so the query is
    * deterministic and always has hits at every SF), then every
    * occurrence is located and docs are ranked by occurrence count.
    *
    * Scale shape: adjacent pairs come from an index-HOF over the token
    * array (`transform(sequence(...))` — NARROW, no per-doc window
    * shuffle; the bigram sits next to its 1-based position before any
    * explode). Pass 1 aggregates bigram counts (the stats a real
    * positional index precomputes); pass 2 re-derives pairs and prunes
    * to the broadcast 1-row phrase IMMEDIATELY after the narrow
    * explode, so the only shuffle carries matching occurrences. Top
    * docs via TakeOrderedAndProject.
    */
  def q126(spark: SparkSession, dir: String): DataFrame = {
    def pairs(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(cast(i as bigint) as pos," +
          " toks[i-1] as w1, toks[i] as w2))")).as("p"))
      .select(col("doc_id"), col("p.pos"), col("p.w1"), col("p.w2"))
    val docs = table(spark, dir, "documents")
    val phrase = pairs(docs)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2")).limit(1)
      .select(col("w1"), col("w2"))
    pairs(docs)
      .join(broadcast(phrase), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
      .orderBy(col("n_occ").desc, col("doc_id"))
      .limit(PhraseTop)
  }

  val q126Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, tok, pos FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
       |           generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t WHERE tok <> ''),
       |seq AS (
       |  SELECT doc_id, tok,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos
       |  FROM toks),
       |bp AS (
       |  SELECT doc_id, pos, tok AS w1, lead(tok) OVER w AS w2
       |  FROM seq WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |bg AS (SELECT * FROM bp WHERE w2 IS NOT NULL),
       |top1 AS (
       |  SELECT w1, w2 FROM (
       |    SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2)
       |  ORDER BY c DESC, w1, w2 LIMIT 1)
       |SELECT doc_id, count(*) AS n_occ,
       |       CAST(min(pos) AS BIGINT) AS first_pos
       |FROM bg JOIN top1 USING (w1, w2)
       |GROUP BY doc_id
       |ORDER BY n_occ DESC, doc_id LIMIT $PhraseTop""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_repeated_chunks" -> (q101 _),
    "q102_domain_quota" -> (q102 _),
    "q103_ann_recall" -> (q103 _),
    "q104_inverted_index" -> (q104 _),
    "q105_bm25" -> (q105 _),
    "q126_phrase_search" -> (q126 _))

  val oracles: Map[String, String] = Map(
    "q101_repeated_chunks" -> q101Oracle,
    "q102_domain_quota" -> q102Oracle,
    "q103_ann_recall" -> q103Oracle,
    "q104_inverted_index" -> q104Oracle,
    "q105_bm25" -> q105Oracle,
    "q126_phrase_search" -> q126Oracle)
}
