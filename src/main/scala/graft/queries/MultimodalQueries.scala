package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.table

/** q29: multimodal-column plumbing (SURVEY.md §2.3 E5) — opaque binary
  * payloads plus typed metadata, oracle-checked at the byte level
  * (UTF-8 encode → octet length → md5 fingerprint). The richer typed
  * pipeline (struct metadata, batch decode stubs, frame sampling) lives
  * in `graft.multimodal` with engine tests; this query pins the part
  * both engines can verify: binary round-trip determinism.
  */
object MultimodalQueries {

  def q29(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(
        col("doc_id"),
        lit("text/plain").as("mime"),
        expr("octet_length(encode(text, 'UTF-8'))").cast("long")
          .as("byte_len"),
        md5(col("text")).as("payload_md5"))
      .orderBy(col("doc_id"))

  val q29Oracle: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |       md5(text) AS payload_md5
      |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_multimodal_binary" -> (q29 _))

  val oracles: Map[String, String] = Map(
    "q29_multimodal_binary" -> q29Oracle)
}
