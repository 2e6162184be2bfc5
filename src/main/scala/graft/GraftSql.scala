package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface: register the testdata tables as temp views and run
  * ANSI SQL through Spark's parser/Catalyst — the same statements the
  * DuckDB oracle runs. Correlated subqueries, CTEs, window clauses etc.
  * come through the standard rewrite rules (e.g. correlated scalar
  * subquery → left outer aggregate join). */
object GraftSql {

  // Memoized per session: re-registering 10 views on every call costs
  // catalog round-trips and re-analysis on each SQL query (visible in
  // bench as ~1s on q46). Keyed by the session's LAST registered dir so a
  // caller that switches scale-factor dirs still gets fresh views. The
  // handful of long-lived sessions per JVM makes the strong keys fine.
  private val lastDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerViews(spark: SparkSession, dir: String): Unit =
    if (lastDir.get(spark) != dir) {
      Tables.names.foreach { n =>
        Tables.load(spark, dir, n).createOrReplaceTempView(n)
      }
      // recorded only AFTER all views registered: a mid-registration throw
      // (bad dir) must leave the memo unset, so a retry re-registers
      // instead of silently skipping to TABLE_OR_VIEW_NOT_FOUND
      lastDir.put(spark, dir)
    }

  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }
}
