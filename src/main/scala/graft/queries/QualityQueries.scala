package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryPack, Tables}
import graft.pipeline.DataQuality
import graft.pipeline.DataQuality._

/** The data-quality gate as a first-class, oracle-checked operator: the
  * declarative check set compiles to one aggregation pass
  * (pipeline/DataQuality.scala) and the report itself is the query result,
  * so the DuckDB oracle proves the CHECK SEMANTICS — null counting, range
  * violations, duplicate-key counting, row-count bounds — not just that a
  * report appeared. */
object QualityQueries extends QueryPack {

  private def q66(s: SparkSession, dir: String): DataFrame =
    DataQuality.report(
      Tables.load(s, dir, "documents"),
      Seq(
        HasColumn("doc_id"), HasColumn("text"), HasColumn("license"),
        NotNull("doc_id"), NotNull("text"), NotNull("lang"),
        InRange("n_chars", 1.0, 100000.0),
        Unique("doc_id"),
        RowCount(min = 1)))

  val defs: Map[String, Q] = Map("q66_quality_report" -> (q66 _))

  // one SELECT per check, mirrored shapes; 'license' is a deliberately
  // missing column so the missing-column path is oracle-checked too
  val oracle: Map[String, String] = Map(
    "q66_quality_report" ->
      """WITH d AS (SELECT * FROM documents),
        |rep AS (
        |  SELECT 'has_column' AS "check", 'doc_id' AS col,
        |    CAST(0 AS BIGINT) AS violations, CAST(1 AS BIGINT) AS total, true AS passed
        |  UNION ALL
        |  SELECT 'has_column', 'text', 0, 1, true
        |  UNION ALL
        |  SELECT 'has_column', 'license', 1, 1, false
        |  UNION ALL
        |  SELECT 'not_null', 'doc_id',
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) = 0
        |  FROM d
        |  UNION ALL
        |  SELECT 'not_null', 'text',
        |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) = 0
        |  FROM d
        |  UNION ALL
        |  SELECT 'not_null', 'lang',
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) = 0
        |  FROM d
        |  UNION ALL
        |  SELECT 'in_range', 'n_chars',
        |    CAST(sum(CASE WHEN n_chars IS NOT NULL
        |      AND (n_chars < 1.0 OR n_chars > 100000.0) THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    sum(CASE WHEN n_chars IS NOT NULL
        |      AND (n_chars < 1.0 OR n_chars > 100000.0) THEN 1 ELSE 0 END) = 0
        |  FROM d
        |  UNION ALL
        |  SELECT 'unique', 'doc_id',
        |    CAST(coalesce((SELECT sum(n - 1) FROM
        |      (SELECT count(*) AS n FROM d GROUP BY doc_id) g WHERE n > 1), 0) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    coalesce((SELECT sum(n - 1) FROM
        |      (SELECT count(*) AS n FROM d GROUP BY doc_id) g WHERE n > 1), 0) = 0
        |  FROM d
        |  UNION ALL
        |  SELECT 'row_count', '',
        |    CASE WHEN count(*) >= 1 THEN 0 ELSE 1 END,
        |    CAST(count(*) AS BIGINT),
        |    count(*) >= 1
        |  FROM d)
        |SELECT * FROM rep ORDER BY "check", col""".stripMargin)
}
