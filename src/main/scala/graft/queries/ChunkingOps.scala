package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q263: RAG chunk-overlap evaluation — the knob-tuning table a
  * retrieval-augmented pipeline decides its chunking from. Documents
  * are windowed into fixed-size chunks at several strides (stride =
  * size means no overlap; smaller strides overlap adjacent chunks),
  * and the query prices the tradeoff both ways, per config:
  *
  *   - storage overhead: overlapping chunks re-store text —
  *     (Σ chunk_chars − corpus_chars) / corpus_chars in permille;
  *   - boundary coverage: a retrieval "needle" span that straddles a
  *     chunk boundary is only fully contained in SOME chunk when the
  *     overlap exceeds the span's boundary crossing — measured on a
  *     FIXED panel of docs (the q103/q192 fixed-panel rule: modulus
  *     plus a literal id cap, never a bare corpus fraction) with a
  *     deterministic needle span at chars [[NeedleLo]]..[[NeedleHi]],
  *     placed to cross the first no-overlap boundary so the sweep
  *     separates the configs.
  *
  * Span containment is pure integer position arithmetic (cstart ≤ lo
  * AND cstart+size−1 ≥ hi) — the honest "is the span inside one chunk"
  * metric, with no string matching that duplicate text could alias.
  *
  * Scale shape: chunk spans come from a map-side double explode
  * (configs × sequence), linear in corpus chars with NO shuffle until
  * the 3-row aggregate; the production chunker emits
  * `substr(text, cstart, size)` on the same frame — the metrics need
  * only the spans. The coverage pass broadcasts the bounded panel.
  * All-integer output, truncating division on both engines.
  */
object ChunkingOps {

  val ChunkSize = 240
  val Strides = Seq(240, 180, 120)

  /** Needle span: crosses the stride-240 boundary at char 241. */
  val NeedleLo = 201L
  val NeedleHi = 280L

  /** Fixed panel: doc_id % 20 == 3 under a literal cap — ≤200 docs at
    * any corpus size; the cap is inert at sf0.01 (ids < 4000) and
    * active from sf0.1 up, so the gate pins both regimes.
    */
  val PanelMod = 20L
  val PanelRes = 3L
  val PanelMax = 4000L

  def q263(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val cfg = Strides.map(st =>
      struct(lit(ChunkSize).as("chunk_size"), lit(st).as("stride")))
    val chunks = docs
      .select(col("doc_id"), col("len"), explode(array(cfg: _*)).as("c"))
      .select(col("doc_id"), col("len"),
        col("c.chunk_size").as("chunk_size"), col("c.stride").as("stride"))
      .select(col("doc_id"), col("chunk_size"), col("stride"), col("len"),
        explode(expr("sequence(0L, (len - 1) div stride)")).as("i"))
      .select(col("doc_id"), col("chunk_size"), col("stride"),
        (lit(1L) + col("i") * col("stride")).as("cstart"),
        least(col("chunk_size").cast("long"),
          col("len") - (lit(1L) + col("i") * col("stride")) + lit(1L))
          .as("clen"))
    val stats = chunks.groupBy(col("chunk_size"), col("stride"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("clen")).as("chunk_chars"))
    val tot = docs.agg(sum(col("len")).as("corpus_chars"))
    val panel = docs
      .filter(col("doc_id") % PanelMod === PanelRes &&
        col("doc_id") < PanelMax && col("len") >= NeedleHi)
      .select(col("doc_id"))
    val cov = chunks.join(broadcast(panel), Seq("doc_id"))
      .filter(col("cstart") <= NeedleLo &&
        col("cstart") + col("chunk_size") - lit(1L) >= NeedleHi)
      .select(col("chunk_size"), col("stride"), col("doc_id")).distinct()
      .groupBy(col("chunk_size"), col("stride"))
      .agg(count(lit(1)).as("covered"))
    val pc = panel.agg(count(lit(1)).as("panel_docs"))
    stats.crossJoin(broadcast(tot)).crossJoin(broadcast(pc))
      .join(cov, Seq("chunk_size", "stride"), "left")
      .select(col("chunk_size").cast("long").as("chunk_size"),
        col("stride").cast("long").as("stride"),
        col("n_chunks"),
        expr("((chunk_chars - corpus_chars) * 1000) div corpus_chars")
          .as("overhead_permille"),
        col("panel_docs"),
        coalesce(col("covered"), lit(0L)).as("covered"),
        expr("(coalesce(covered, 0) * 1000) div greatest(panel_docs, 1)")
          .as("coverage_permille"))
      .orderBy(col("stride").desc)
  }

  val q263Oracle: String = {
    val cfgVals = Strides.map(st => s"($ChunkSize, $st)").mkString(", ")
    s"""WITH cfg(chunk_size, stride) AS (VALUES $cfgVals),
       |docs AS (SELECT doc_id, length(text) AS len FROM documents),
       |chunks AS MATERIALIZED (
       |  SELECT doc_id, chunk_size, stride,
       |         1 + i * stride AS cstart,
       |         LEAST(CAST(chunk_size AS BIGINT),
       |               len - (1 + i * stride) + 1) AS clen
       |  FROM (SELECT d.doc_id, d.len, c.chunk_size, c.stride,
       |               unnest(generate_series(0, (d.len - 1) // c.stride)) AS i
       |        FROM docs d CROSS JOIN cfg c)),
       |stats AS (
       |  SELECT chunk_size, stride, count(*) AS n_chunks,
       |         CAST(sum(clen) AS BIGINT) AS chunk_chars
       |  FROM chunks GROUP BY 1, 2),
       |tot AS (SELECT CAST(sum(len) AS BIGINT) AS corpus_chars FROM docs),
       |panel AS (
       |  SELECT doc_id FROM docs
       |  WHERE doc_id % $PanelMod = $PanelRes AND doc_id < $PanelMax
       |    AND len >= $NeedleHi),
       |cov AS (
       |  SELECT c.chunk_size, c.stride, c.doc_id
       |  FROM chunks c JOIN panel p ON p.doc_id = c.doc_id
       |  WHERE c.cstart <= $NeedleLo
       |    AND c.cstart + c.chunk_size - 1 >= $NeedleHi
       |  GROUP BY 1, 2, 3),
       |covc AS (
       |  SELECT chunk_size, stride, count(*) AS covered
       |  FROM cov GROUP BY 1, 2),
       |pc AS (SELECT count(*) AS panel_docs FROM panel)
       |SELECT CAST(s.chunk_size AS BIGINT) AS chunk_size,
       |       CAST(s.stride AS BIGINT) AS stride,
       |       s.n_chunks,
       |       ((s.chunk_chars - t.corpus_chars) * 1000) // t.corpus_chars
       |         AS overhead_permille,
       |       p.panel_docs,
       |       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered,
       |       (COALESCE(c.covered, 0) * 1000) // greatest(p.panel_docs, 1)
       |         AS coverage_permille
       |FROM stats s CROSS JOIN tot t CROSS JOIN pc p
       |LEFT JOIN covc c
       |  ON c.chunk_size = s.chunk_size AND c.stride = s.stride
       |ORDER BY stride DESC""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q263_chunk_overlap_eval" -> (q263 _))

  val oracles: Map[String, String] = Map(
    "q263_chunk_overlap_eval" -> q263Oracle)
}
