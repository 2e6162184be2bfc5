package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe inner equi-join: salt the skewed (big) side's key into
  * `salts` sub-keys and explode the small side once per salt, so a hot key
  * spreads over `salts` reducers instead of one straggler task.
  *
  * AQE's skew-join split handles sort-merge skew automatically, but salting
  * is still the tool when the skew is in an aggregation-after-join or the
  * join is forced to shuffle-hash; this operator keeps it deterministic
  * (salt = xxhash64 of the whole row, not rand()) so results are
  * reproducible run to run.
  */
object SaltedJoin {
  def apply(big: DataFrame, small: DataFrame, key: String, salts: Int)
      : DataFrame = {
    val bigCols: Array[Column] = big.columns.map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols.toIndexedSeq: _*)), lit(salts)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
