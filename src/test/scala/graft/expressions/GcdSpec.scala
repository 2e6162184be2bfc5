package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The native int_gcd expression: Euclid fixpoints, DuckDB-matching edge
  * semantics (zeros, negatives), codegen vs interpreted agreement, and a
  * property sweep against BigInt.gcd. */
class GcdSpec extends SparkSuite {
  import spark.implicits._

  private def gcdOf(a: Long, b: Long): Long = {
    Gcd.register(spark)
    Seq((a, b)).toDF("a", "b")
      .select(expr("int_gcd(a, b)")).head().getLong(0)
  }

  test("known values and DuckDB edge semantics") {
    assert(gcdOf(12, 18) == 6)
    assert(gcdOf(7, 13) == 1)
    assert(gcdOf(0, 42) == 42) // gcd(0, x) = |x|
    assert(gcdOf(42, 0) == 42)
    assert(gcdOf(0, 0) == 0)
    assert(gcdOf(-12, 18) == 6) // result is non-negative for negatives
    assert(gcdOf(-12, -18) == 6)
  }

  test("matches BigInt.gcd on a deterministic sweep (codegen path)") {
    Gcd.register(spark)
    val rows = spark.range(1000).selectExpr(
      "cast(id * 2654435761 % 100003 - 50000 as long) as a",
      "cast(id * 40503 % 9973 - 4986 as long) as b")
    val bad = rows
      .select(col("a"), col("b"), expr("int_gcd(a, b)").as("g"))
      .collect()
      .filter { r =>
        val want = BigInt(r.getLong(0)).gcd(BigInt(r.getLong(1))).toLong
        r.getLong(2) != want
      }
    assert(bad.isEmpty, s"mismatches: ${bad.take(3).mkString(",")}")
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    val e = Gcd(
      org.apache.spark.sql.catalyst.expressions.Literal(84L),
      org.apache.spark.sql.catalyst.expressions.Literal(-30L))
    assert(e.eval(null) == 6L)
  }

  test("null inputs propagate null") {
    Gcd.register(spark)
    val r = Seq((Some(4L), Option.empty[Long])).toDF("a", "b")
      .select(expr("int_gcd(a, b)")).head()
    assert(r.isNullAt(0))
  }
}
