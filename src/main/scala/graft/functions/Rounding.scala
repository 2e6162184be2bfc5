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
}
