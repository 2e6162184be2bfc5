package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of queries plus their DuckDB oracle SQL.
  *
  * Contract (see SparkEntry): every key in `defs` that is SQL-expressible has
  * a matching key in `oracle` whose DuckDB output hash-matches the Spark
  * result — same column names, deterministic row order on both sides.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def defs: Map[String, Q]
  def oracle: Map[String, String]
}
