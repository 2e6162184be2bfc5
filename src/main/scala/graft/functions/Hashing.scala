package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's portable hash-to-integer primitives: md5 hex prefixes cast
  * to integers, with DuckDB SQL mirrors that produce bit-identical values
  * (DuckDB parses '0x…' strings in integer casts). One definition here so
  * the parity-critical Spark/SQL pairs cannot drift apart — used by
  * MinHash (DedupQueries), rolling fingerprints (TextQueries), and
  * deterministic sampling (EventOpsQueries). */
object Hashing {

  /** First 32-bit half of md5 as a long in [0, 2³²). */
  def md5U32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  def md5U32Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  /** Second 32-bit half — gives MinHash an independent 2-universal
    * coefficient from the same single md5 evaluation. */
  def md5U32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")
  def md5U32bSql(e: String): String =
    s"CAST('0x' || substr(md5($e), 9, 8) AS BIGINT)"

  /** Deterministic uniform in [0,1): stable across runs, partitionings,
    * and engines — the property rand()/sample() lacks. */
  def md5Uniform(c: Column): Column =
    md5U32(c).cast("double") / lit(4294967296.0)
  def md5UniformSql(e: String): String =
    s"(${md5U32Sql(e)} / 4294967296.0)"
}
