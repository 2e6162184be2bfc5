package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental rollup — the don't-rescan-history pattern: keep a compact
  * per-key STATE table (count / exact sum / min / max), fold each new
  * batch into its own state with one aggregation over just the delta, and
  * merge states with one keyed aggregation over state rows. At 100 TB the
  * daily cost is O(delta) + O(keys), not O(history); the q95 oracle pins
  * the algebraic requirement that makes this sound — merge(state(A),
  * state(B)) ≡ state(A ∪ B) — by comparing the merged result to a full
  * recompute in another engine.
  *
  * Sums accumulate in decimal(38,0) INSIDE the state so merging any
  * number of epochs stays exact; [[finalizeState]] casts out to BIGINT
  * at the edge. All four metrics are semigroup-mergeable; metrics that
  * are not (exact distinct, exact quantiles) need sketch states instead —
  * see q72/q75 for the accuracy-contract pattern that governs those. */
object IncrementalAgg {

  /** Aggregate raw rows into a mergeable state table:
    * keys..., n, sum_c (decimal), min_c, max_c. */
  def state(df: DataFrame, keys: Seq[String], centsCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(centsCol.cast("decimal(38,0)")).as("sum_c"),
      min(centsCol).as("min_c"),
      max(centsCol).as("max_c"))

  /** Merge state tables (any number of epochs) into one state. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"),
        max(col("max_c")).as("max_c"))
  }

  /** Cast the exact decimal accumulators out to BIGINT for consumption. */
  def finalizeState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("n").cast("long").as("n"),
        col("sum_c").cast("long").as("sum_c"),
        col("min_c"), col("max_c")): _*)
}
