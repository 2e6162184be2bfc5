package graft.operators

import graft.SparkSuite

/** CDC merge semantics: update, insert, delete, same-version tie (delta
  * wins), multi-version snapshots, and pure-upsert deltas without a
  * tombstone column. */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L), (3L, "c2", 11L)
  ).toDF("k", "v", "ver")

  test("upsert applies updates, inserts, and tombstone deletes") {
    val delta = Seq(
      (2L, "b-new", 12L, false), // update
      (4L, "d", 12L, false),     // insert
      (3L, "dead", 12L, true)    // delete (kills BOTH snapshot versions)
    ).toDF("k", "v", "ver", "_deleted")
    val got = Merge.upsert(snapshot, delta, Seq("k"), "ver")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 2L -> "b-new", 4L -> "d"))
  }

  test("same-version tie resolves to the delta row") {
    val delta = Seq((1L, "a-corrected", 10L, false))
      .toDF("k", "v", "ver", "_deleted")
    val got = Merge.upsert(snapshot, delta, Seq("k"), "ver")
      .filter($"k" === 1L).collect()
    assert(got.map(_.getString(1)).toSeq == Seq("a-corrected"))
  }

  test("stale delta (older version) loses to the snapshot") {
    val delta = Seq((3L, "old-news", 5L, false))
      .toDF("k", "v", "ver", "_deleted")
    val got = Merge.upsert(snapshot, delta, Seq("k"), "ver")
      .filter($"k" === 3L).collect()
    assert(got.map(_.getString(1)).toSeq == Seq("c2"))
  }

  test("NULL tombstone flag means upsert, not delete") {
    // the allowMissingColumns union shape: upsert rows get _deleted = NULL
    val delta = Seq((5L, "e", 12L, Option.empty[Boolean]),
      (2L, "dead", 12L, Some(true)))
      .toDF("k", "v", "ver", "_deleted")
    val got = Merge.upsert(snapshot, delta, Seq("k"), "ver")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 3L -> "c2", 5L -> "e"))
  }

  test("tieBreakCols make duplicate (key, version) batches deterministic") {
    val delta = Seq((1L, "x1", 10L, false), (1L, "x2", 10L, false))
      .toDF("k", "v", "ver", "_deleted")
    val got = Merge.upsert(snapshot, delta, Seq("k"), "ver",
      tieBreakCols = Seq("v")).filter($"k" === 1L).collect()
    assert(got.map(_.getString(1)).toSeq == Seq("x2")) // max v wins
  }

  test("delta without a tombstone column is a pure upsert batch") {
    val delta = Seq((1L, "a2", 99L)).toDF("k", "v", "ver")
    val got = Merge.upsert(snapshot, delta, Seq("k"), "ver")
      .orderBy("k").collect().map(_.getString(1)).toSeq
    assert(got == Seq("a2", "b", "c2"))
  }
}
