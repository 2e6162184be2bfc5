package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins [[TableDiff]] classification semantics — including the null-safe
  * compare rules a naive `=!=` would get wrong — and the plan shape (one
  * keyed join, no broadcast-of-big-side assumptions baked in). */
class TableDiffSpec extends SparkSuite {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, Some(10.0), "a"), // unchanged
    (2L, Some(20.0), "b"), // value change
    (3L, None, "c"),       // null → value: a change
    (4L, Some(40.0), "d"), // value → null: a change
    (5L, None, "e"),       // null → null: NOT a change
    (6L, Some(60.0), "f")  // removed
  ).toDF("k", "v", "s")

  private def newDf = Seq(
    (1L, Some(10.0), "a"),
    (2L, Some(21.0), "b"),
    (3L, Some(30.0), "c"),
    (4L, None, "d"),
    (5L, None, "e"),
    (7L, Some(70.0), "g")  // added
  ).toDF("k", "v", "s")

  test("added/removed/changed/unchanged, with null-safe comparisons") {
    val got = TableDiff.diff(oldDf, newDf, Seq("k"), Seq("v", "s"))
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.toSeq == Seq(
      1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "changed", 5L -> "unchanged", 6L -> "removed", 7L -> "added"))
  }

  test("compare column subset: a change outside the subset is invisible") {
    val got = TableDiff.diff(oldDf, newDf, Seq("k"), Seq("s"))
      .filter(col("change") === "changed").count()
    assert(got == 0L) // only v changed anywhere; s never did
  }

  test("empty compare list degrades to key presence diff") {
    val got = TableDiff.diff(oldDf, newDf, Seq("k"), Nil)
      .groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unchanged" -> 5L, "removed" -> 1L, "added" -> 1L))
  }

  test("composite keys join on all parts") {
    val o = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val n = Seq((1L, "x", 1.0), (1L, "z", 3.0)).toDF("k1", "k2", "v")
    val got = TableDiff.diff(o, n, Seq("k1", "k2"), Seq("v"))
      .orderBy("k2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "x", "unchanged"), (1L, "y", "removed"), (1L, "z", "added")))
  }
}
