package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins both packing contracts: contiguous (window arithmetic, the
  * oracle-checked q77 face) and greedy first-fit (sequential semantics no
  * window expresses — never overflow a pack unless a single row alone
  * exceeds the budget, never reorder, restart per stream). */
class SequencePackSpec extends SparkSuite {
  import spark.implicits._

  test("contiguous: pack = which budget-multiple the row STARTS in") {
    val df = Seq(
      ("en", 1L, 40L), ("en", 2L, 40L), ("en", 3L, 40L), ("en", 4L, 40L),
      ("fr", 1L, 150L), ("fr", 2L, 10L))
      .toDF("lang", "doc_id", "w")
    val got = SequencePack
      .contiguous(df, "lang", "doc_id", col("w"), budget = 100L)
      .orderBy("lang", "doc_id")
      .select("lang", "doc_id", "cum_w", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      // starts at 0,40,80,120 → packs 0,0,0,1
      ("en", 1L, 40L, 0L), ("en", 2L, 80L, 0L),
      ("en", 3L, 120L, 0L), ("en", 4L, 160L, 1L),
      // oversized first row starts at 0 → pack 0; next starts at 150 → 1
      ("fr", 1L, 150L, 0L), ("fr", 2L, 160L, 1L)))
  }

  test("greedy: first-fit closes packs at the boundary, never overflows") {
    val df = Seq(
      ("en", 1L, 60L), ("en", 2L, 30L), ("en", 3L, 20L), ("en", 4L, 90L),
      ("en", 5L, 10L), ("en", 6L, 150L), ("en", 7L, 5L))
      .toDF("lang", "doc_id", "w")
    val got = SequencePack.greedy(df, "lang", "doc_id", "w", budget = 100L)
      .orderBy("order").collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    // 60+30 fits; +20 would overflow → new pack; 20+? 90 overflows → new;
    // 90+10 fits; 150 alone (oversized) gets its own; 5 starts fresh
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L,
      5L -> 2L, 6L -> 3L, 7L -> 4L))
    // invariant on a bigger random-ish input: no pack over budget unless
    // it is a single oversized row, and pack ids are contiguous from 0
    val big = (0 until 5000).map(i =>
      (s"s${i % 7}", i.toLong, (i * 131 % 97).toLong + 1L))
      .toDF("lang", "doc_id", "w")
    val packed = SequencePack.greedy(big, "lang", "doc_id", "w", 100L)
    val sums = packed.groupBy("stream", "pack_id")
      .agg(sum("weight").as("tot"), count(lit(1)).as("n"))
    assert(sums.filter(col("tot") > 100L && col("n") > 1L).count() == 0)
    val perStream = packed.groupBy("stream")
      .agg(countDistinct("pack_id").as("d"), max("pack_id").as("m"))
    assert(perStream.filter(col("d") =!= col("m") + 1L).count() == 0)
  }

  test("greedy restarts state per stream even within one partition") {
    val df = Seq(("a", 1L, 80L), ("b", 1L, 80L), ("c", 1L, 80L))
      .toDF("lang", "doc_id", "w").coalesce(1)
    val got = SequencePack.greedy(df, "lang", "doc_id", "w", 100L)
      .select("stream", "pack_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // each stream's first row must open ITS OWN pack 0
    assert(got == Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
  }

  test("zero/negative weights never produce negative fill") {
    val df = Seq(("a", 1L, 0L), ("a", 2L, -5L), ("a", 3L, 100L))
      .toDF("lang", "doc_id", "w")
    val got = SequencePack.greedy(df, "lang", "doc_id", "w", 100L)
      .orderBy("order").select("pack_id").collect().map(_.getLong(0))
    // clamped weights leave fill at 0, so the exact-budget row still fits
    assert(got.toSeq == Seq(0L, 0L, 0L))
  }
}
