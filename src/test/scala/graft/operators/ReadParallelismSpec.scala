package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The adaptive fan-out guard (r20): repartitions a scan-adjacent frame
  * to the session parallelism ONLY when its current partitioning cannot
  * fill a quarter of it — the unsplittable-input remedy that must be a
  * structural no-op at production split counts. */
class ReadParallelismSpec extends SparkSuite {

  /** Run `body` under a temporary shuffle-partition setting (the
    * MinhashTuningSpec conf-flip pattern; restored in finally). */
  private def withParallelism[A](np: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, np.toString)
    try body finally spark.conf.set(key, old)
  }

  test("fans a single-partition frame out to the session parallelism") {
    withParallelism(16) {
      val one = spark.range(1000).toDF("id").coalesce(1)
      assert(one.rdd.getNumPartitions == 1)
      val fanned = ReadParallelism.fanOut(one, col("id"))
      assert(fanned.rdd.getNumPartitions == 16,
        "a 1-partition input must fan out to numShufflePartitions")
    }
  }

  test("no-ops when the input already fills the parallelism") {
    withParallelism(16) {
      val wide = spark.range(1000).toDF("id").repartition(16, col("id"))
      val out = ReadParallelism.fanOut(wide, col("id"))
      assert(out.queryExecution.analyzed eq wide.queryExecution.analyzed,
        "an already-parallel input must pass through untouched (no new " +
          "exchange at production split counts)")
    }
  }

  test("fan-out preserves the row multiset exactly") {
    withParallelism(16) {
      val one = spark.range(999).toDF("id")
        .withColumn("v", col("id") % 7).coalesce(1)
      val fanned = ReadParallelism.fanOut(one, col("id"))
      assert(fanned.count() == 999L)
      assert(fanned.exceptAll(one).isEmpty && one.exceptAll(fanned).isEmpty,
        "repartitioning must move rows, never change them")
    }
  }
}
