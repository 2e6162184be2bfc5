package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe inner equi-join: salt the skewed (big) side's key into
  * `salts` sub-keys and explode the small side once per salt, so a hot key
  * spreads over `salts` reducers instead of one straggler task.
  *
  * AQE's skew-join split handles sort-merge skew automatically, but salting
  * is still the tool when the skew is in an aggregation-after-join or the
  * join is forced to shuffle-hash. The salt is a per-row ordinal
  * (`monotonically_increasing_id` = partition id << 33 + intra-partition
  * ordinal) taken mod `salts`: exact-duplicate rows — the common hot-key
  * shape — still land on different salts, and the salt value cannot affect
  * join OUTPUT (only reducer placement), so reproducibility is unaffected.
  */
object SaltedJoin {
  def apply(big: DataFrame, small: DataFrame, key: String, salts: Int)
      : DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
