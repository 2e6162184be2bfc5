package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-agnostic fixed-point rounding.
  *
  * `round(x, n)` diverges between engines on exact .xxx5-boundary doubles:
  * Spark rounds the shortest-decimal-string representation of x
  * (`BigDecimal.valueOf`), DuckDB rounds the scaled binary value — e.g.
  * raw 0.31375 → Spark 0.3138, DuckDB 0.3137. Every oracle-checked query
  * therefore rounds with `floor(x · 10^n + 0.5) / 10^n` in BOTH engines:
  * the same three IEEE-754 double ops on the same bits yield the same
  * result everywhere. (Negative half-intervals round toward +inf rather
  * than away from zero — consistently in both engines, which is what
  * parity needs.)
  */
object Rounding {

  private def pow10(n: Int): Double = math.pow(10, n) // exact for n ≤ 22

  /** Column-side floor-form rounding to n decimal places. */
  def roundf(c: Column, n: Int): Column = {
    val p = pow10(n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** SQL-side mirror of [[roundf]] for oracle statements. The literal is
    * rendered as e.g. `10000.0` so DuckDB parses it as DOUBLE and runs the
    * identical IEEE ops. */
  def roundfSql(e: String, n: Int): String = {
    val p = pow10(n)
    s"floor(($e) * $p + 0.5) / $p"
  }

  /** Exact-decimal (2-fractional-digit) columns scaled to integral
    * hundredths in int64. Fixed-point integer SUMS are exact and
    * order-independent, which closes the one divergence channel floor-form
    * rounding cannot: money sums land exactly ON rounding boundaries
    * (the inputs are decimal-grained), where a summation-order ULP
    * difference between engines flips the rounded result. Sum the cents,
    * divide once at the end — both engines then run identical integer
    * adds and one identical double division. */
  def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** SQL-side mirror of [[cents]]. */
  def centsSql(e: String): String =
    s"CAST(floor(($e) * 100.0 + 0.5) AS BIGINT)"
}
