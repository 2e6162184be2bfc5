package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry surface: register the testdata tables as temp views and run
  * ANSI SQL through Spark's parser/Catalyst — the same statements the
  * DuckDB oracle runs. Correlated subqueries, CTEs, window clauses etc.
  * come through the standard rewrite rules (e.g. correlated scalar
  * subquery → left outer aggregate join). */
object GraftSql {
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }

  def run(spark: SparkSession, dir: String, sql: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sql)
  }
}
