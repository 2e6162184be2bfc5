package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact 1-based global rank over a TOTAL order — the scale-safe twin of
  * `row_number()/ntile() OVER (ORDER BY …)` with no PARTITION BY, which
  * every SQL engine (Spark included) plans as a SINGLE partition holding
  * the entire input: correct at 1500 rows, dead at 10^9. Here the global
  * order is recovered in two distributed passes:
  *
  *   1. range-repartition on the sort key + sort within partitions —
  *      Spark's own global-sort shape (`TakeOrderedAndProject`'s big
  *      sibling), every partition bounded;
  *   2. per-partition row counts (one tiny action: #partitions longs to
  *      the driver) become broadcast prefix offsets, and a second
  *      per-partition pass assigns rank = offset + local position.
  *
  * The per-partition imperative step (a running counter over an already-
  * sorted iterator) is genuine `mapPartitions` territory — no Catalyst
  * expression can see partition boundaries — which is why this is one of
  * the engine's few RDD drops (SURVEY §"Spark mapping" last-resort rule).
  *
  * DETERMINISM CONTRACT: `sortExprs` must be a total order (include a
  * tie-breaking key). Then the assigned rank is the row's position in
  * that order — independent of partition count, range boundaries, and
  * scheduling — so output is bit-stable across runs and cluster sizes.
  * The input is eagerly localCheckpoint-ed so the count pass and the
  * rank pass see the SAME materialized partitions (a lazy lineage could
  * legally recompute with different sampling in `repartitionByRange`).
  */
object GlobalRank {

  /** Append `rankCol` (LongType, 1-based) in the total order of
    * `sortExprs`. */
  def withRank(df: DataFrame, rankCol: String, sortExprs: Column*)
      : DataFrame = {
    val spark = df.sparkSession
    val np = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(np, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .localCheckpoint(true)
    val rdd = sorted.rdd
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) =>
        Iterator.single((pid, it.size.toLong)))
      .collect().toMap
    val offsets = (0 until rdd.getNumPartitions)
      .scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
      .toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(
      sorted.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = bc.value(pid)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(ranked, schema)
  }

  /** SQL-standard `ntile(k)` bucket as a pure integer formula of
    * (rank, n): with q = n div k and r = n mod k, the first r buckets
    * hold q+1 rows and the rest hold q — exactly the NTILE definition
    * both Spark and DuckDB implement, so
    * `bucketOf(rank, n, k) ≡ ntile(k) OVER (ORDER BY …)` for every rank
    * in the same total order (GlobalRankSpec pins the equivalence).
    * Integer division is the engine-portable `(a - a%b)/b` construction
    * ([[graft.functions.Rounding.intDiv]]); all operands stay far below
    * 2^53 (ranks), so no decimal chain is needed. */
  def bucketOf(rank: Column, n: Column, k: Int): Column = {
    val idiv = graft.functions.Rounding.intDiv _
    val q = idiv(n, lit(k.toLong))
    val r = n % lit(k.toLong)
    when(rank <= r * (q + lit(1L)),
      idiv(rank - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(r + idiv(rank - r * (q + lit(1L)) - lit(1L), q) + lit(1L))
  }
}
