package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins the exact-division contract past the 2^53 double ceiling — the
  * regime [[Rounding.intDiv]] explicitly does NOT cover and
  * [[Rounding.intDivExact]] exists for. The DuckDB mirror
  * (`intDivExactSql` → HUGEINT `//`) was verified by hand against
  * DuckDB 1.0.0 to agree with every pinned value here, including the
  * dividend-signed truncation rows (`-7 // 2 = -3`, not floor's -4);
  * q144 keeps that agreement continuously oracle-checked with live
  * > 2^63 dividends. */
class RoundingSpec extends SparkSuite {
  import Rounding._

  private def one(c: org.apache.spark.sql.Column): Long = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).as[Long].head()
  }

  test("intDivExact is exact just past 2^53 where the double path breaks") {
    // (2^53 + 1) · 7 / 7: the double path returns 2^53 + 2 (ADVICE repro)
    val d = lit(9007199254740993L).cast("decimal(38,0)") * lit(7L)
    assert(one(intDivExact(d, lit(7L))) === 9007199254740993L)
  }

  test("intDivExact handles dividends past 2^63 via decimal widening") {
    // 4.5e10 · 1e10 = 4.5e20 > 2^63: long·long would wrap; the caller
    // widens the left factor, per the scaladoc contract
    val d = lit(45000000000L).cast("decimal(38,0)") * lit(10000000000L)
    assert(one(intDivExact(d, lit(45000000L))) === 10000000000000L)
    // non-exact multiple truncates: (4.5e20 + 44999999) / 4.5e7
    val d2 = d + lit(44999999L)
    assert(one(intDivExact(d2, lit(45000000L))) === 10000000000000L)
  }

  test("intDivExact truncates toward zero on signed operands") {
    assert(one(intDivExact(lit(-7L), lit(2L))) === -3L) // floor would be -4
    assert(one(intDivExact(lit(7L), lit(-2L))) === -3L)
    assert(one(intDivExact(lit(-7L), lit(-2L))) === 3L)
    // signed past 2^53 too
    val d = lit(-9007199254740993L).cast("decimal(38,0)") * lit(7L)
    assert(one(intDivExact(d + lit(3L), lit(7L))) === -9007199254740992L)
  }

  test("intDiv matches intDivExact inside its documented domain") {
    for ((a, b) <- Seq((0L, 3L), (10L, 3L), (1000000007L, 97L),
        ((1L << 52) - 1L, 12345L)))
      assert(one(intDiv(lit(a), lit(b))) === one(intDivExact(lit(a), lit(b))))
  }
}
