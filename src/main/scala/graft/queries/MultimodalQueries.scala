package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.MultimodalOps

/** Metadata-side multimodal query (the SQL-expressible part of the binary
  * column plumbing — decode itself is the stubbed Dataset op, tested in
  * MultimodalSpec). */
object MultimodalQueries extends QueryPack {

  private def q60(s: SparkSession, dir: String): DataFrame = {
    val media = MultimodalOps.mediaTable(Tables.load(s, dir, "documents"))
    media.select(
      col("doc_id"), col("format"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_fp"),
      greatest(lit(1L), floor(length(col("payload")) / 16.0)).as("stride16"),
      // empty payload → 0 frames (matches MultimodalOps.frameCount and the
      // oracle's floor division; Spark's `div` truncates toward zero, which
      // would give 1 for length 0)
      when(length(col("payload")) === 0, lit(0L))
        .otherwise(expr("(length(payload) - 1) div 16 + 1")).as("n_frames"))
      .orderBy("doc_id")
  }

  val defs: Map[String, Q] = Map("q60_multimodal_meta" -> (q60 _))

  val oracle: Map[String, String] = Map(
    "q60_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'img'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS format,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS payload_fp,
        |  CAST(greatest(1, floor(octet_length(encode(text)) / 16.0)) AS BIGINT) AS stride16,
        |  (octet_length(encode(text)) - 1) // 16 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)
}
