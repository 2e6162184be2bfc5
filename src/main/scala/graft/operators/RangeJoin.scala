package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bin-accelerated interval (range) join.
  *
  * Spark plans a pure range predicate — `point >= lo AND point < hi` with
  * no equi key — as a nested-loop join: O(|points| · |intervals|), the
  * classic scale cliff. The standard fix (used by every engine with a
  * native range join) is binning: quantize the domain into fixed-width
  * bins, emit each interval once per bin it overlaps, key each point by
  * its bin, equi-join on the bin id, and re-check the exact predicate.
  * Work becomes O(|points| + |intervals| · bins_per_interval + matches),
  * shuffles hash-partition on the bin id, and every Spark join strategy
  * (broadcast, sort-merge, AQE skew handling) applies to the equi key.
  *
  * Correctness: a point lies in exactly one bin, and a matching interval
  * overlaps that bin, so every true match appears exactly once — no
  * dedup pass needed. Pick `width` near the typical interval length:
  * shorter intervals per bin → fewer join candidates; an interval spans
  * ceil(len/width)+1 bins at most.
  *
  * Columns are referenced by name; `point`, `lo`, `hi` must be numeric
  * (cast timestamps with unix_micros first). `hi` is exclusive.
  */
object RangeJoin {
  def binned(points: DataFrame, intervals: DataFrame,
      point: String, lo: String, hi: String, width: Long): DataFrame = {
    require(width > 0, "bin width must be positive")
    val p = points.withColumn("__bin",
      floor(col(point) / lit(width)).cast("long"))
    // Bin range for [lo, hi): start = floor(lo/w); stop = ceil(hi/w) - 1 —
    // the last bin that can contain a point strictly below hi, correct for
    // NON-INTEGRAL bounds too (floor((hi-1)/w) would drop bin 6 for
    // hi = 6.5, w = 1, and step sequence() backwards for hi - lo < 1).
    // With hi > lo enforced (degenerate/corrupt intervals match nothing,
    // and sequence(start, stop) would otherwise fabricate a huge DESCENDING
    // bin array for lo >> hi), stop >= start always holds.
    val i = intervals
      .filter(col(hi) > col(lo))
      .withColumn("__bin",
        explode(sequence(
          floor(col(lo) / lit(width)).cast("long"),
          (ceil(col(hi) / lit(width)) - lit(1)).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(point) >= col(lo) && col(point) < col(hi))
      .drop("__bin")
  }

  /** Interval-interval OVERLAP join, binned — the two-sided sibling of
    * [[binned]]: all (left, right) row pairs whose half-open intervals
    * `[lLo, lHi)` and `[rLo, rHi)` intersect, with no equi key to carry the
    * join (Spark would otherwise plan a nested-loop product).
    *
    * Both sides explode to the bins their interval covers and equi-join on
    * the bin id. A pair can share several bins; instead of a dedup
    * exchange, the match is COUNTED exactly once — in the first bin both
    * intervals occupy, `floor(max(lLo, rLo) / width)`: that bin exists for
    * every true overlap (the larger lower bound lies inside both
    * intervals), and the filter rejects the pair in every other shared
    * bin. Work is O(rows · bins_per_interval + matches), one shuffle keyed
    * on the bin id, every join strategy and AQE skew split applicable —
    * the q49/q65 binning argument, applied to interval pairs.
    *
    * Column names must be disjoint across `left` and `right` (rename
    * first); intervals with `hi <= lo` are degenerate and match nothing. */
  def overlapBinned(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      width: Long): DataFrame = {
    require(width > 0, "bin width must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) > col(lo))
      .withColumn("__bin",
        explode(sequence(
          floor(col(lo) / lit(width)).cast("long"),
          (ceil(col(hi) / lit(width)) - lit(1)).cast("long"))))
    binned(left, lLo, lHi)
      .join(binned(right, rLo, rHi), Seq("__bin"))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__bin") ===
          floor(greatest(col(lLo), col(rLo)) / lit(width)).cast("long"))
      .drop("__bin")
  }
}
