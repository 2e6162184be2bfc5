package graft.queries

import graft.SparkSuite

/** q192 (cross-document long-substring overlap) on planted ground truth:
  * documents are built token-by-token with unique filler words, so every
  * shared run's exact length and multiplicity is known by construction —
  * the sf corpora check it against DuckDB, this pins the ALGEBRA (run =
  * r consecutive width-8 shingles ⇔ r+7 shared tokens, the ≥12-token
  * report bar, disjoint runs counted separately, diagonal separation of
  * a span repeated at different offsets). */
class SubstringOverlapSpec extends SparkSuite {

  // unique filler so no accidental 8-gram ever matches across docs
  private def filler(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"f$tag$i")

  private def span(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"s$tag$i")

  private def runQ192(docs: Seq[(Long, Seq[String])]): Seq[(Long, Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("q192fix").toString
    val rows = docs.map { case (id, toks) =>
      val text = toks.mkString(" ")
      (id, text, "en", s"src${id % 3}", text.length.toLong)
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("q192_substring_overlap")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("a planted 20-token shared span reports exactly (20, 1)") {
    val s20 = span("a", 20)
    val got = runQ192(Seq(
      0L -> (filler("p", 10) ++ s20 ++ filler("q", 10)),
      1L -> (filler("r", 15) ++ s20 ++ filler("t", 5))))
    assert(got == Seq((0L, 1L, 20L, 1L)))
  }

  test("an 11-token overlap is below the 12-token report bar") {
    val s11 = span("b", 11)
    val got = runQ192(Seq(
      0L -> (filler("p", 10) ++ s11 ++ filler("q", 10)),
      1L -> (filler("r", 10) ++ s11 ++ filler("t", 10))))
    assert(got.isEmpty)
    // ...and 12 is on it
    val s12 = span("c", 12)
    val got12 = runQ192(Seq(
      0L -> (filler("p", 10) ++ s12 ++ filler("q", 10)),
      1L -> (filler("r", 10) ++ s12 ++ filler("t", 10))))
    assert(got12 == Seq((0L, 1L, 12L, 1L)))
  }

  test("two disjoint shared spans count as separate overlaps") {
    val sA = span("d", 12); val sB = span("e", 15)
    val got = runQ192(Seq(
      0L -> (sA ++ filler("p", 10) ++ sB),
      1L -> (sB ++ filler("q", 10) ++ sA)))
    assert(got == Seq((0L, 1L, 15L, 2L)))
  }

  test("a span repeated at two offsets in one doc yields two diagonal runs") {
    val sA = span("g", 14)
    val got = runQ192(Seq(
      0L -> (filler("p", 5) ++ sA ++ filler("q", 9) ++ sA),
      1L -> (filler("r", 7) ++ sA ++ filler("t", 7))))
    assert(got == Seq((0L, 1L, 14L, 2L)))
  }

  test("three documents sharing one span report all three pairs") {
    val sA = span("h", 13)
    val got = runQ192(Seq(
      0L -> (filler("p", 4) ++ sA),
      1L -> (sA ++ filler("q", 4)),
      2L -> (filler("r", 2) ++ sA ++ filler("t", 2))))
    assert(got == Seq((0L, 1L, 13L, 1L), (0L, 2L, 13L, 1L),
      (1L, 2L, 13L, 1L)))
  }
}
