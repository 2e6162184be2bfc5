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
  // caller that switches scale-factor dirs still gets fresh views.
  // Weak keys: a dropped SparkSession must not be pinned by this memo.
  private val lastDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def registerViews(spark: SparkSession, dir: String): Unit = {
    // the sentinel guards against out-of-band view drops: a memo hit with
    // the first table missing from the catalog means someone dropped or
    // replaced the temp views since registration — re-register instead of
    // failing later with TABLE_OR_VIEW_NOT_FOUND (one catalog lookup is
    // far cheaper than 10 registrations + per-query re-analysis)
    val hit = lastDir.get(spark) == dir &&
      spark.catalog.tableExists(Tables.names.head)
    if (!hit) {
      Tables.names.foreach { n =>
        Tables.load(spark, dir, n).createOrReplaceTempView(n)
      }
      // recorded only AFTER all views registered: a mid-registration throw
      // (bad dir) must leave the memo unset, so a retry re-registers
      // instead of silently skipping to TABLE_OR_VIEW_NOT_FOUND
      lastDir.put(spark, dir)
    }
  }

  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }
}
