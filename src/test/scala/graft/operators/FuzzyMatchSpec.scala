package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The position-keyed deletion-neighborhood join must equal brute-force
  * all-pairs levenshtein ≤ 1 — including on the shapes that defeat the
  * naive bare-variant join: distance-2 strings sharing a variant at
  * different positions, repeated characters, and length-2 indel chains. */
class FuzzyMatchSpec extends SparkSuite {

  private def bruteForce(names: Seq[String]): Set[(String, String)] =
    (for {
      a <- names; b <- names if a < b
      if levDist(a, b) <= 1
    } yield (a, b)).toSet

  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def viaOperator(names: Seq[String]): Set[(String, String)] = {
    import spark.implicits._
    FuzzyMatch.editDistance1Pairs(names.toDF("name"), "name")
      .as[(String, String)].collect().toSet
  }

  private def check(names: Seq[String]): Unit =
    assert(viaOperator(names) === bruteForce(names))

  test("substitution, insertion, deletion pairs are all found") {
    check(Seq("cat", "bat", "cart", "ca", "dog"))
  }

  test("distance-2 strings sharing a deletion variant are rejected") {
    // "abc" and "cab" share variant "ab" (pos 3 vs pos 1) but are
    // distance 2 — the exact trap the position filter exists for
    check(Seq("abc", "cab", "bca"))
  }

  test("transpositions are distance 2, not 1 (no Damerau here)") {
    check(Seq("abcd", "abdc", "bacd"))
  }

  test("repeated characters do not duplicate or drop pairs") {
    check(Seq("aaa", "aa", "aaaa", "aba", "baa", "ab"))
  }

  test("zero-padded id shapes (the customer-name domain)") {
    val names = (0 until 120).map(i => f"Customer#$i%09d")
    check(names)
  }

  test("empty and single-char strings") {
    check(Seq("", "a", "b", "ab", "ba"))
  }
}
