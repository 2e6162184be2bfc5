package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning: build a compact bloom filter over the
  * (filtered) dimension keys, then drop fact rows whose key cannot be in the
  * dimension BEFORE the fact side is shuffled for the exact join.
  *
  * This is the manual form of the row-level runtime filtering Spark's
  * optimizer injects for selective joins
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`): at 100 TB the win is
  * that the pruned fact rows never enter the join exchange — for a 1%-
  * selective dimension the shuffle shrinks ~100×, at the cost of one scan of
  * the (small) dimension and a filter the fact scan evaluates map-side. The
  * bloom is a SUPERSET filter (false positives only, never false negatives),
  * so following it with the exact join preserves exact join semantics —
  * which is what lets the DuckDB oracle be the plain join (q70).
  *
  * Uses Spark's own sketch expressions ([[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]] over xxhash64 of the key), so the filter
  * evaluation is codegen'd — no UDF in the fact scan's hot path.
  *
  * Reference behavior note: the reference engine has no bloom pruning; this
  * is part of the scale extension surface (SURVEY §2 extensions), applied to
  * the reference's fact-dim join shapes.
  */
object BloomPrune {

  /** Serialized bloom filter over `keys(key)`, built distributed (partial
    * aggregation map-side, one merged sketch on the driver — the same
    * materialization shape as Spark's injected runtime filter subquery).
    * `expectedItems` sizes the filter; the default false-positive rate of
    * ~3% at that cardinality costs `expectedItems` bytes, so even 10^8
    * dimension keys broadcast ~100 MB — size it from the FILTERED dim. */
  def bloomOf(keys: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftSqlBridge.expression(keys(key)))), expectedItems)
      .toAggregateExpression()
    val row = keys.select(GraftSqlBridge.column(agg).as("bf")).head()
    // empty dimension → the aggregate yields null; an always-false filter
    // is represented by the empty bloom (serialized zero-insert filter)
    if (row.isNullAt(0)) {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.BloomFilter.create(1).writeTo(out)
      out.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Predicate `might_contain(bloom, xxhash64(keyCol))` as a codegen'd
    * Column. NULL keys hash to the seed value like any other input, and the
    * exact join downstream discards any false positive — superset-safe. */
  def mightContain(bloom: Array[Byte], keyCol: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftSqlBridge.expression(keyCol)))))

  /** Exact inner equi-join with the fact side bloom-pruned first. Result is
    * identical to `fact.join(dim, fact(factKey) === dim(dimKey))` — the
    * bloom only removes rows the join would drop anyway. */
  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloom = bloomOf(dim.select(dimKey), dimKey, expectedItems)
    fact.filter(mightContain(bloom, fact(factKey)))
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
