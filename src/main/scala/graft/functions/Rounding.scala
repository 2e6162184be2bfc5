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
    * difference between engines flips the rounded result. Sum the cents
    * via [[sumExact]], divide once at the end — both engines then run
    * identical integer adds and one identical double division. */
  def cents(c: Column): Column =
    floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** SQL-side mirror of [[cents]]. */
  def centsSql(e: String): String =
    s"CAST(floor(($e) * 100.0 + 0.5) AS BIGINT)"

  /** Overflow-safe exact sum of a fixed-point int64 term, as double.
    * Spark's sum(long) wraps silently past 2^63 (ANSI off) while DuckDB's
    * sum(BIGINT) promotes to HUGEINT — a three-factor cents product is
    * ~10^11 per row, so a ~10^8-row group would diverge AND be garbage.
    * Summing through decimal(38,0) is exact to 10^38 (≳10^26 rows), and
    * the final decimal→double conversion is round-to-nearest from the
    * same exact integer in both engines. */
  def sumExact(term: Column): Column =
    sum(term.cast("decimal(38,0)")).cast("double")

  /** SQL-side mirror of [[sumExact]] (DuckDB sums BIGINT as HUGEINT —
    * already exact — so only the double conversion is spelled out). */
  def sumExactSql(e: String): String =
    s"CAST(sum($e) AS DOUBLE)"

  /** Fully-integer exact sum of a cents term: BIGINT out, no double
    * anywhere. This is the terminal de-floating move for oracle columns —
    * integer outputs cannot ulp-diverge in any engine's arithmetic (FMA
    * contraction, sum→double cast paths) nor in any hasher's treatment of
    * DOUBLE bits. The decimal(38,0) accumulator keeps the sum exact past
    * int64 in Spark (sum(long) wraps silently with ANSI off). */
  def sumCents(term: Column): Column =
    sum(term.cast("decimal(38,0)")).cast("long")

  /** SQL-side mirror of [[sumCents]] — portable to both engines: Spark and
    * DuckDB each sum DECIMAL(38,0) exactly, and the final BIGINT cast is
    * exact integer-to-integer. */
  def sumCentsSql(e: String): String =
    s"CAST(sum(CAST($e AS DECIMAL(38,0))) AS BIGINT)"

  /** Engine-portable exact floor division of NON-NEGATIVE int64 values with
    * `a < 2^53`. Neither engine's native integer-division operator is used
    * (Spark `div` vs DuckDB `//` — spelling and edge semantics differ);
    * instead `(a - a % b) / b`: the numerator is exactly divisible by b, so
    * the double division yields the exact integer quotient (< 2^53 ⇒
    * representable), and the BIGINT cast is exact. Same three ops, same
    * bits, both engines — the q73 de-floating discipline applied to
    * division. */
  def intDiv(a: Column, b: Column): Column =
    ((a - (a % b)) / b).cast("long")

  /** SQL-side mirror of [[intDiv]]. */
  def intDivSql(a: String, b: String): String =
    s"CAST((($a) - (($a) % ($b))) / ($b) AS BIGINT)"

  /** [[intDiv]] without the 2^53 ceiling, Spark side: the same exactly-
    * divisible-numerator construction run in DECIMAL(38,0) arithmetic —
    * mod, subtraction, and the exact-multiple division (an integer
    * quotient, exactly representable at the result scale) carry no
    * rounding in Spark at any int64 magnitude. Use when the dividend can
    * exceed 2^53 (q139's token-scaled products, q144's e12-scaled
    * averages); costs a decimal op chain instead of three double ops.
    * Truncates toward zero (both operands' `%` is dividend-signed).
    * CALLER WIDENS PRODUCTS: `a` is cast to decimal only after it is
    * computed, so a long·long product that overflows int64 must be
    * widened by the caller (`x.cast("decimal(38,0)") * y`) before the
    * call — this helper cannot un-wrap a wrapped input. */
  def intDivExact(a: Column, b: Column): Column = {
    val ad = a.cast("decimal(38,0)")
    val bd = b.cast("decimal(38,0)")
    ((ad - (ad % bd)) / bd).cast("long")
  }

  /** Loud-failure guard for exactness contracts that would otherwise
    * degrade SILENTLY: with ANSI off, Spark turns decimal(38,0) overflow
    * into NULL rather than an error, so a metric whose operands outgrow
    * precision 38 (q286/q288 near ~10⁶-10⁷ vectors) would simply vanish
    * from the output instead of failing. Wrapping the final metric keeps
    * the value bit-identical when present and raises with a diagnostic
    * message the moment the documented bound is crossed — an explicit
    * failure a 100 TB run can alert on, not a quietly-missing row.
    * `raise_error` is lazy inside the untaken branch, so in-contract rows
    * never evaluate it; oracle parity is unaffected (the guard never
    * fires at oracle SFs, by the documented bound). */
  def requireNotNull(c: Column, msg: String): Column =
    when(c.isNotNull, c).otherwise(raise_error(lit(msg)))

  /** SQL-side mirror of [[intDivExact]] — NOT the same construction,
    * deliberately: DuckDB evaluates DECIMAL `/` through DOUBLE (verified
    * on v1.0.0: `(2^53+1)·7 / 7` via the decimal chain returns
    * 9007199254740994), so the decimal mirror would silently re-open the
    * 2^53 ceiling on the oracle side. DuckDB's HUGEINT `//` is exact
    * 128-bit integer division and truncates toward zero exactly like the
    * Spark construction (verified: `-7 // 2 = -3`, dividend-signed).
    * As on the Spark side, the caller widens `$a` itself (e.g.
    * `CAST(x AS HUGEINT) * y`) if the product can overflow BIGINT —
    * though DuckDB errors loudly on int64 overflow rather than
    * wrapping, so an unwidened oracle fails fast instead of diverging. */
  def intDivExactSql(a: String, b: String): String =
    s"CAST(CAST($a AS HUGEINT) // CAST($b AS HUGEINT) AS BIGINT)"
}
