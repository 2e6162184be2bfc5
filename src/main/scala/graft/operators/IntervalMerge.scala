package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Overlapping-interval merge (gaps-and-islands): collapse a set of
  * [start, end] intervals per key into maximal non-overlapping islands.
  * The interval sibling of [[graft.streaming.StreamingOps]]' gap
  * sessionization (q63 sessionizes POINT events by inter-event gap; this
  * merges DURATIONS by overlap — a meeting-room/claim/validity-window
  * shape the reference's point-based sessionize cannot express).
  *
  * Algorithm (one pass, two windows over the same sort): an interval
  * starts a new island iff its start exceeds the running max end of all
  * preceding intervals; the island id is the running count of such
  * starts. Both windows share `partitionBy(key).orderBy(start, end)`, so
  * Catalyst plans ONE shuffle and ONE sort for the whole operator.
  *
  * 100 TB posture: one hash-partition shuffle on the key; per-key work is
  * a linear scan. Equal (start, end) duplicates are order-insensitive
  * under the running max, so the result is deterministic even with tied
  * sort keys.
  */
object IntervalMerge {

  /** Adds an `island` column (0-based per key). */
  def islands(df: DataFrame, keyCol: String, start: Column, end: Column)
      : DataFrame = {
    val order = Window.partitionBy(keyCol).orderBy(start, end)
    val preceding = order.rowsBetween(Window.unboundedPreceding, -1)
    val inclusive = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_new_island",
        // empty frame → null running max → first row opens island 0
        when(start > max(end).over(preceding), 1L).otherwise(0L))
      .withColumn("island", sum(col("_new_island")).over(inclusive))
      .drop("_new_island")
  }

  /** Merged islands: one row per maximal overlap group with its span and
    * member count. */
  def merge(df: DataFrame, keyCol: String, start: Column, end: Column)
      : DataFrame =
    islands(df.withColumn("_start", start).withColumn("_end", end),
        keyCol, col("_start"), col("_end"))
      .groupBy(col(keyCol), col("island"))
      .agg(min("_start").as("start"), max("_end").as("end"),
        count(lit(1)).as("n"))
}
