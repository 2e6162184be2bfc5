package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running aggregates over a TOTAL order — the scale-safe twin
  * of `sum(x)/min(x) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`, which,
  * like the partition-less rank ([[GlobalRank]]), every SQL engine plans
  * as ONE partition holding the whole input. Same two-pass shape:
  * range-repartition + sort within partitions, then each partition's
  * TOTAL aggregate (one tiny action) becomes a broadcast prefix seed and
  * a second per-partition pass folds rows left-to-right from that seed.
  * The per-row fold over a sorted iterator is genuine `mapPartitions`
  * territory (Catalyst expressions cannot carry running state across
  * rows of a partition), the engine's few-RDD-drops rule as in
  * [[GlobalRank]].
  *
  * Values are Long and the folds are exact integer ops (wrap-free up to
  * int64 — callers scale to cents/fixed-point first, the engine-wide
  * de-floating discipline), so results are bit-stable across partition
  * counts and runs given a total `sortExprs` order.
  */
object PrefixScan {

  /** Append `outCol` = running SUM of `valueCol` (inclusive of the current
    * row) in the total order of `sortExprs`. */
  def runningSum(df: DataFrame, valueCol: String, outCol: String,
      sortExprs: Column*): DataFrame =
    scan(df, valueCol, outCol, sortExprs, 0L, _ + _)

  /** Append `outCol` = running MIN of `valueCol` (inclusive) in the total
    * order of `sortExprs`. */
  def runningMin(df: DataFrame, valueCol: String, outCol: String,
      sortExprs: Column*): DataFrame =
    scan(df, valueCol, outCol, sortExprs, Long.MaxValue, math.min)

  /** Two-pass distributed left fold. `zero` must be `combine`'s identity:
    * partitions with no rows contribute `zero` to every later seed. */
  private def scan(df: DataFrame, valueCol: String, outCol: String,
      sortExprs: Seq[Column], zero: Long,
      combine: (Long, Long) => Long): DataFrame = {
    val spark = df.sparkSession
    val np = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(np, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .localCheckpoint(true)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single((pid, it.foldLeft(zero)((acc, row) =>
        combine(acc, row.getLong(idx)))))
    }.collect().toMap
    val seeds = (0 until rdd.getNumPartitions)
      .scanLeft(zero)((acc, pid) => combine(acc, totals.getOrElse(pid, zero)))
      .toArray
    val bc = spark.sparkContext.broadcast(seeds)
    val schema = StructType(
      sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { row =>
        acc = combine(acc, row.getLong(idx))
        Row.fromSeq(row.toSeq :+ acc)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
