package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Binned range join: must equal the naive theta join exactly, across bin
  * boundaries, interval lengths, and empty overlaps. */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  test("binned equals the naive nested-loop range join on adversarial data") {
    // points on and around bin edges; intervals shorter, equal to, and far
    // longer than the bin width; plus an interval matching nothing
    val pts = Seq(0L, 9L, 10L, 11L, 19L, 20L, 21L, 99L, 100L, 101L, 250L)
      .toDF("p")
    val ivs = Seq(
      (0L, 10L), (10L, 20L), (5L, 15L),   // edges + straddle
      (0L, 101L),                          // spans many bins
      (300L, 400L),                        // matches nothing
      (20L, 21L))                          // single-point-wide
      .toDF("lo", "hi")
    val binned = RangeJoin.binned(pts, ivs, "p", "lo", "hi", width = 10L)
      .select("p", "lo", "hi")
    val naive = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "lo", "hi")
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("non-integral bounds: matches in the top bin survive; sub-width " +
      "and degenerate intervals emit no spurious bins") {
    val pts = Seq(6.2, 5.3, 4.9, 5.0).toDF("p")
    val ivs = Seq(
      (5.0, 6.5),   // crosses a bin edge with fractional hi → bin 6 needed
      (5.2, 5.4),   // shorter than a bin, inside bin 5
      (7.0, 7.0),   // degenerate: matches nothing, must emit nothing
      (9.0, 2.0))   // corrupt (hi < lo): must emit nothing
      .toDF("lo", "hi")
    val binned = RangeJoin.binned(pts, ivs, "p", "lo", "hi", width = 1L)
      .select("p", "lo", "hi")
    val naive = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "lo", "hi")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    // the fractional-hi top-bin match is present
    assert(binned.filter(col("p") === 6.2 && col("hi") === 6.5).count() == 1)
  }

  test("each true match appears exactly once (no bin-overlap duplicates)") {
    val pts = (0L until 200L).toDF("p")
    val ivs = Seq((0L, 200L)).toDF("lo", "hi") // one interval over 20+ bins
    val out = RangeJoin.binned(pts, ivs, "p", "lo", "hi", width = 7L)
    assert(out.count() == 200)
    assert(out.select("p").distinct().count() == 200)
  }

  test("plan joins on the bin id, not a nested loop") {
    val pts = (0L until 50L).toDF("p")
    val ivs = Seq((0L, 25L), (25L, 50L)).toDF("lo", "hi")
    val plan = RangeJoin.binned(pts, ivs, "p", "lo", "hi", width = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("overlapBinned equals the naive overlap product, exactly once per " +
      "pair, across widths") {
    // deterministic pseudo-random intervals: lengths from sub-width to
    // many-bin, touching endpoints (half-open: [a,b) ∩ [b,c) = ∅),
    // nested, disjoint, and identical intervals on both sides
    val left = (0L until 60L)
      .map(i => (i, (i * 37) % 199, (i * 37) % 199 + 1 + (i * 13) % 50))
      .toDF("lid", "l_lo", "l_hi")
    val right = (0L until 60L)
      .map(j => (j, (j * 53) % 211, (j * 53) % 211 + 1 + (j * 7) % 80))
      .toDF("rid", "r_lo", "r_hi")
    val naive = left.crossJoin(right)
      .filter(col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("lid", "rid")
    for (w <- Seq(1L, 8L, 64L, 1024L)) {
      val out = RangeJoin.overlapBinned(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", w).select("lid", "rid")
      assert(out.exceptAll(naive).isEmpty && naive.exceptAll(out).isEmpty,
        s"width $w diverged from the naive overlap product")
    }
  }

  test("overlapBinned: touching and degenerate intervals match nothing") {
    val left = Seq((1L, 0L, 10L), (2L, 5L, 5L)).toDF("lid", "l_lo", "l_hi")
    val right = Seq((1L, 10L, 20L), (2L, 4L, 6L)).toDF("rid", "r_lo", "r_hi")
    val out = RangeJoin.overlapBinned(
      left, right, "l_lo", "l_hi", "r_lo", "r_hi", 4L).select("lid", "rid")
    // [0,10) vs [10,20) touch but do not overlap; [5,5) is degenerate
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L)))
  }

  test("overlapBinned plan joins on the bin id, not a nested loop") {
    val left = (0L until 20L).map(i => (i, i, i + 5)).toDF("lid", "l_lo", "l_hi")
    val right = (0L until 20L).map(j => (j, j, j + 3)).toDF("rid", "r_lo", "r_hi")
    val plan = RangeJoin.overlapBinned(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
