package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[EncodingDamage]] — the q193 census is all zeros on the clean
  * synthetic corpus, so the DAMAGED paths are pinned here on crafted
  * fixtures: each detector must fire on its own damage class and stay
  * silent on legitimate text (tabs/newlines, real accented words,
  * typographic quotes). Fixtures spell the damage as \\u escapes so the
  * bytes under test are visible in the source. */
class EncodingDamageSpec extends SparkSuite {

  private def counts(s: String): (Long, Long, Long) = {
    val row = spark.createDataFrame(Seq(Tuple1(s))).toDF("t")
      .select(
        EncodingDamage.ctrlCount(col("t")).cast("long"),
        EncodingDamage.replacementCount(col("t")).cast("long"),
        EncodingDamage.mojibakeCount(col("t")).cast("long"))
      .head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  test("clean ASCII with tabs/newlines/CR is undamaged") {
    assert(counts("plain text\twith\ntabs and\r\nbreaks") == ((0L, 0L, 0L)))
  }

  test("C0 controls and DEL are counted; whitespace controls are not") {
    // SOH, BEL, DEL scattered in text
    assert(counts("a\u0001b\u0007c\u007Fd") == ((3L, 0L, 0L)))
    // VT and FF are in the damage class (not ordinary whitespace)
    assert(counts("\u000B\u000C") == ((2L, 0L, 0L)))
  }

  test("U+FFFD replacement characters are counted individually") {
    assert(counts("bad \uFFFD decode \uFFFD\uFFFD") == ((0L, 3L, 0L)))
  }

  test("UTF-8-as-Latin-1 mojibake bigrams fire") {
    // "e-acute" (U+00E9) double-decoded -> U+00C3 U+00A9 ("A-tilde (c)")
    assert(counts("caf\u00C3\u00A9") == ((0L, 0L, 1L)))
    // right single quote (U+2019) double-decoded -> U+00E2 U+20AC U+2019
    assert(counts("it\u00E2\u20AC\u2019s fine") == ((0L, 0L, 1L)))
    // NBSP double-decoded -> U+00C2 U+00A0
    assert(counts("x\u00C2\u00A0y") == ((0L, 0L, 1L)))
  }

  test("legitimate accents and typography do not fire") {
    // bare A-tilde before ASCII space (capitalized French "a-grave"),
    // real e-acute/o-circumflex, an em-dash and direct typographic
    // quotes: all clean
    assert(counts("\u00C3 bient\u00F4t \u2014 caf\u00E9 " +
      "\u2019quoted\u2019") == ((0L, 0L, 0L)))
  }

  test("isDamaged is the OR of the three detectors") {
    val df = spark.createDataFrame(Seq(
      Tuple1("clean"), Tuple1("ctrl\u0001"), Tuple1("moji caf\u00C3\u00A9")))
      .toDF("t")
    val flags = df.select(EncodingDamage.isDamaged(col("t")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(flags == Seq(false, true, true))
  }
}
