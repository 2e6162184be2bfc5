package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String) =
    Seq(text).toDF("t").select(c.as("v")).head()

  test("tokenCount counts non-whitespace runs") {
    assert(one(TextAnalysis.tokenCount(col("t")), "a b  cc\td").getLong(0) == 4)
    assert(one(TextAnalysis.tokenCount(col("t")), "   ").getLong(0) == 0)
  }

  test("normalizeText collapses whitespace and case") {
    assert(one(TextAnalysis.normalizeText(col("t")), "  A  B\t C ")
      .getString(0) == "a b c")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one(TextAnalysis.fingerprint(col("t")), "Hello   World")
    val b = one(TextAnalysis.fingerprint(col("t")), "hello world ")
    assert(a.getString(0) == b.getString(0))
  }

  test("langId picks the profile with most function-word hits") {
    assert(one(TextAnalysis.langId(col("t")),
      "the cat is in the bag and it is fine").getString(0) == "en")
    assert(one(TextAnalysis.langId(col("t")),
      "el perro y la casa de que en los un dia").getString(0) == "es")
    assert(one(TextAnalysis.langId(col("t")),
      "der hund und die katze ist ein nicht").getString(0) == "de")
  }

  test("qualityScore is bounded [0, 1] and favors clean prose") {
    val clean = one(TextAnalysis.qualityScore(col("t")),
      ("the quick brown fox jumps over the lazy dog and it is a fine day " +
        "in the park ") * 5).getDouble(0)
    val junk = one(TextAnalysis.qualityScore(col("t")),
      "@@## 11 22 $$ %% ^^ && ** (( ))").getDouble(0)
    assert(clean > junk)
    assert(clean <= 1.0 && junk >= 0.0)
  }

  test("wordNgrams: distinct n-grams, empty below n tokens") {
    val g = one(TextAnalysis.wordNgrams(col("t"), 3), "a b c d")
      .getSeq[String](0)
    assert(g == Seq("a b c", "b c d"))
    assert(one(TextAnalysis.wordNgrams(col("t"), 3), "a b")
      .getSeq[String](0).isEmpty)
  }
}
