package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving for multi-dimensional data clustering.
  *
  * Sorting a table by `interleave(bucket(a), bucket(b))` before writing
  * places rows that are close in BOTH dimensions into the same files, so
  * parquet min/max row-group stats prune scans filtered on EITHER column —
  * the layout trick behind Delta/Iceberg `ZORDER BY`, expressed here as a
  * plain deterministic column. A single-column sort clusters only its
  * leading column; Z-order trades a little locality in each dimension for
  * usable locality in all of them.
  *
  * Both a Column form (codegen'd, used by [[graft.sources.Formats.writeZOrdered]])
  * and a SQL-text mirror (for the DuckDB oracle and SQL-surface queries) are
  * generated from the same bit-placement rule, so the two can never drift.
  *
  * Inputs must be non-negative ints < 2^bits (bucket/clamp first — see
  * [[bucketSql]]); `n·bits` must stay ≤ 62 to fit a signed int64.
  */
object ZOrder {

  private def checkArgs(n: Int, bits: Int): Unit = {
    require(n >= 1, "need at least one column")
    require(bits >= 1 && n * bits <= 62,
      s"$n cols x $bits bits = ${n * bits} interleaved bits; max 62")
  }

  /** Bit i of `cols(j)` lands at output position `i * cols.size + j`.
    * Inputs are widened to int64 first — shifting a 32-bit int past bit 31
    * would silently wrap. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    checkArgs(cols.size, bits)
    val n = cols.size
    val wide = cols.map(_.cast("long"))
    val parts = for {
      i <- 0 until bits
      (c, j) <- wide.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    parts.reduce(_ bitwiseOR _)
  }

  /** SQL mirror of [[interleave]] — identical bit placement, expressed in
    * pure integer `%` / comparison / `*` / `+` arithmetic rather than
    * `>> << & |`: bitwise-operator semantics (and even parsing) have varied
    * across DuckDB releases, while modulo/multiply/add on non-negative
    * BIGINTs cannot. Bit `i` of non-negative x is `(x % 2^(i+1)) >= 2^i`;
    * placing it at output position p is `* 2^p`; positions are disjoint so
    * the OR-combine is a plain sum. */
  def interleaveSql(exprs: Seq[String], bits: Int): String = {
    checkArgs(exprs.size, bits)
    val n = exprs.size
    val parts = for {
      i <- 0 until bits
      (e, j) <- exprs.zipWithIndex
    } yield s"(CAST(((CAST($e AS BIGINT)) % ${1L << (i + 1)}) >= ${1L << i} AS BIGINT) * ${1L << (i * n + j)})"
    parts.mkString("(", " + ", ")")
  }

  /** Portable non-negative bucketing: `((x % m) + m) % m` — identical in
    * both engines for negative inputs, unlike bare `%`. */
  def bucketSql(e: String, m: Int): String = s"(((($e) % $m) + $m) % $m)"

  /** Column form of [[bucketSql]]. */
  def bucket(c: Column, m: Int): Column = pmod(c, lit(m.toLong))
}
