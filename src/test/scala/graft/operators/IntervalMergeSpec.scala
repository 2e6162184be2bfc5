package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Pins [[IntervalMerge]]: touching vs overlapping vs disjoint intervals,
  * containment, duplicate intervals, per-key isolation, and the
  * one-shuffle plan contract (both windows + the final group-by share one
  * hash partitioning on the key). */
class IntervalMergeSpec extends SparkSuite {
  import spark.implicits._

  test("islands: overlap and containment merge; strict gaps split") {
    val df = Seq(
      // [0,10] [5,15] overlap → island 0; [15,20] touches (15 !> 15) →
      // still island 0; [21,25] strictly after → island 1
      (1L, 0L, 10L), (1L, 5L, 15L), (1L, 15L, 20L), (1L, 21L, 25L),
      // containment: [0,100] swallows [10,20] and [30,40]
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 30L, 40L),
      // another key entirely disjoint from key 1's ranges
      (3L, 1000L, 1001L))
      .toDF("k", "s", "e")
    val got = IntervalMerge.merge(df, "k", col("s"), col("e"))
      .orderBy("k", "island").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 20L, 3L), (1L, 1L, 21L, 25L, 1L),
      (2L, 0L, 0L, 100L, 3L),
      (3L, 0L, 1000L, 1001L, 1L)))
  }

  test("duplicate intervals are order-insensitive and counted") {
    val df = Seq((1L, 5L, 9L), (1L, 5L, 9L), (1L, 5L, 9L))
      .toDF("k", "s", "e").repartition(3)
    val got = IntervalMerge.merge(df, "k", col("s"), col("e")).collect()
    assert(got.length == 1 && got.head.getLong(4) == 3L)
  }

  test("one shuffle: windows and group-by reuse the same partitioning") {
    val df = Seq((1L, 0L, 1L), (2L, 3L, 4L)).toDF("k", "s", "e")
    val plan = IntervalMerge.merge(df, "k", col("s"), col("e"))
      .queryExecution.executedPlan.toString
    // exactly one hash-partitioning exchange in the whole operator
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }
}
