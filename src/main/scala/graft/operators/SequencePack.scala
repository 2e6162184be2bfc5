package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign ordered documents
  * to fixed-budget "packs" (context-window batches) so downstream
  * tokenization/batching reads contiguous, size-bounded groups.
  *
  * Two strategies, different contracts:
  *
  *  - [[contiguous]]: pack boundary every `budget` weight units of the
  *    running total — `pack_id = floor((cumsum - w) / budget)`. A document
  *    may straddle a boundary (its pack is where it STARTS). Pure window
  *    arithmetic: deterministic, one shuffle on the stream key,
  *    SQL-expressible in any engine — this is the oracle-checked face.
  *  - [[greedy]]: classic first-fit-in-order — close the pack when the
  *    next document would overflow, never splitting a document; an
  *    oversized document gets a pack of its own. Inherently a sequential
  *    scan per stream, so it runs as `repartition(streamCol) +
  *    sortWithinPartitions + mapPartitions` with O(1) state per stream —
  *    no group is ever materialized, arbitrarily large streams flow
  *    through. Not window-expressible (the boundary depends on the
  *    previous boundary), hence spec-pinned rather than oracle-checked.
  *
  * 100 TB posture: both are one hash-partition shuffle by stream; skewed
  * streams serialize within their partition, which is intrinsic to
  * order-respecting packing — shard the stream key upstream if a single
  * stream exceeds one executor's throughput.
  */
object SequencePack {

  /** Adds `cum_w` (inclusive running weight) and `pack_id` per stream,
    * ordered by `orderCol`. */
  def contiguous(df: DataFrame, streamCol: String, orderCol: String,
      weight: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(streamCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_w", sum(weight).over(w))
      // double division is exact for realistic cumulative weights (< 2^53)
      // and portable across engines, unlike integer-div operators
      .withColumn("pack_id",
        floor((col("cum_w") - weight) / budget.toDouble).cast("long"))
  }

  case class PackIn(stream: String, order: Long, weight: Long)
  case class PackOut(stream: String, order: Long, weight: Long, pack_id: Long)

  /** First-fit greedy packing over (stream, order, weight) rows; returns
    * (stream, order, weight, pack_id) with pack_id 0-based per stream.
    * Join the result back on (stream, order) to carry other columns. */
  def greedy(df: DataFrame, streamCol: String, orderCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import df.sparkSession.implicits._
    val ds = df.select(
      col(streamCol).cast("string").as("stream"),
      col(orderCol).cast("long").as("order"),
      col(weightCol).cast("long").as("weight")).as[PackIn]
    ds.repartition(col("stream"))
      .sortWithinPartitions("stream", "order")
      // sequential first-fit; streams are contiguous after the sort, so
      // one (stream, fill, id) register suffices — O(1) state, no group
      // materialization, mapPartitions preserves the sorted order
      .mapPartitions { rows =>
        var cur: String = null
        var first = true
        var fill = 0L
        var id = 0L
        rows.map { r =>
          if (first || r.stream != cur) {
            cur = r.stream; first = false; fill = 0L; id = 0L
          }
          val w = math.max(0L, r.weight)
          if (fill > 0L && fill + w > budget) { id += 1; fill = 0L }
          fill += w
          PackOut(r.stream, r.order, r.weight, id)
        }
      }.toDF()
  }
}
