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
    scan(df, Seq(Col(valueCol, outCol, Long.MaxValue, math.min)), sortExprs)

  /** Append one running-SUM column per `(valueCol, outCol)` pair, all in
    * the SAME total order, in ONE range-shuffle + fold pass. This is the
    * rank-plus-mass shape: a running sum over a ones column IS the
    * 1-based global rank (what [[GlobalRank.withRank]] computes), so a
    * caller needing `row_number()` AND `sum() ROWS UNBOUNDED PRECEDING`
    * over the same order (the q337/q349 vocabulary-coverage curves) pays
    * one shuffle and one checkpoint instead of two of each. */
  def runningSums(df: DataFrame, cols: Seq[(String, String)],
      sortExprs: Column*): DataFrame = {
    require(cols.nonEmpty, "runningSums needs at least one column pair")
    scan(df, cols.map { case (v, o) => Col(v, o, 0L, _ + _) }, sortExprs)
  }

  /** [[runningSums]], returned as an eager localCheckpoint with the
    * scan's internal range-sorted SCRATCH checkpoint released. The plain
    * form leaves that scratch pinned for the session's life (its blocks
    * back the lazily-read result) — fine for a one-shot query, wrong for
    * a memoized substrate that rebuilds per (session, dir): each rebuild
    * would strand a vocab-scale checkpoint. This is the form a
    * SessionDirMemo build should call. */
  def runningSumsMaterialized(df: DataFrame, cols: Seq[(String, String)],
      sortExprs: Column*): DataFrame = {
    require(cols.nonEmpty, "runningSums needs at least one column pair")
    scan(df, cols.map { case (v, o) => Col(v, o, 0L, _ + _) }, sortExprs,
      materialize = true)
  }

  /** One scanned column: input field, output field, fold identity and
    * combiner (`zero` must be `combine`'s identity — partitions with no
    * rows contribute `zero` to every later seed). */
  private final case class Col(valueCol: String, outCol: String,
      zero: Long, combine: (Long, Long) => Long)

  private def scan(df: DataFrame, valueCol: String, outCol: String,
      sortExprs: Seq[Column], zero: Long,
      combine: (Long, Long) => Long): DataFrame =
    scan(df, Seq(Col(valueCol, outCol, zero, combine)), sortExprs)

  /** Two-pass distributed left fold over k columns at once. */
  private def scan(df: DataFrame, cols: Seq[Col],
      sortExprs: Seq[Column], materialize: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val np = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(np, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .localCheckpoint(true)
    val idxs = cols.map(c => sorted.schema.fieldIndex(c.valueCol)).toArray
    val zeros = cols.map(_.zero).toArray
    val combines = cols.map(_.combine).toArray
    val k = idxs.length
    val rdd = sorted.rdd
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = zeros.clone()
      it.foreach { row =>
        var j = 0
        while (j < k) { acc(j) = combines(j)(acc(j), row.getLong(idxs(j))); j += 1 }
      }
      Iterator.single((pid, acc))
    }.collect().toMap
    val nParts = rdd.getNumPartitions
    val seeds = Array.tabulate(nParts + 1)(_ => zeros.clone())
    for (p <- 0 until nParts; j <- 0 until k)
      seeds(p + 1)(j) = combines(j)(seeds(p)(j),
        totals.get(p).map(_(j)).getOrElse(zeros(j)))
    val bc = spark.sparkContext.broadcast(seeds)
    val schema = StructType(sorted.schema.fields ++
      cols.map(c => StructField(c.outCol, LongType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = bc.value(pid).clone()
      it.map { row =>
        var j = 0
        while (j < k) { acc(j) = combines(j)(acc(j), row.getLong(idxs(j))); j += 1 }
        // ++ materializes the Long values eagerly — no aliasing of `acc`
        Row.fromSeq(row.toSeq ++ acc)
      }
    }
    val result = spark.createDataFrame(out, schema)
    if (!materialize) result
    else {
      val mat = result.localCheckpoint(true)
      // the materialized copy no longer reads the sorted scratch — free
      // its blocks now instead of pinning them for the session's life
      CheckpointBlocks.release(sorted)
      mat
    }
  }
}
