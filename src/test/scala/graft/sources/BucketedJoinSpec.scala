package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.SparkSuite

/** Bucketed tables are the pre-shuffled join layout: both sides written
  * with `bucketBy(n, key)` hash-place rows the same way an exchange would,
  * so an equi-join on the bucket key runs with ZERO shuffles — at 100 TB
  * the difference between moving both tables over the network every query
  * and never moving them again after the one-time layout write. This spec
  * pins the plan property itself (no ShuffleExchangeExec), not a proxy. */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("join on the bucket key plans with zero exchanges") {
    val facts = (0L until 20000L)
      .map(i => (i % 500, i, (i % 97).toDouble)).toDF("k", "id", "v")
    val dims = (0L until 500L).map(i => (i, s"name$i")).toDF("k", "name")
    facts.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k").saveAsTable("facts_bucketed")
    dims.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k").saveAsTable("dims_bucketed")
    // force the sort-merge path (broadcast would hide the property being
    // tested) and plain plans (deterministic node matching)
    val restoreBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.table("facts_bucketed")
        .join(spark.table("dims_bucketed"), "k")
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed equi-join planned ${exchanges.size} exchange(s):\n" +
          j.queryExecution.executedPlan)
      assert(j.count() == 20000L)

      // control: the identical unbucketed join DOES exchange — proving the
      // assertion above measures bucketing, not some session setting
      val ju = facts.join(dims, "k")
      val unbucketed = ju.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(unbucketed.nonEmpty, "control join unexpectedly shuffle-free")
      assert(ju.count() == 20000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restoreBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS facts_bucketed")
      spark.sql("DROP TABLE IF EXISTS dims_bucketed")
    }
  }

  test("bucketed groupBy on the bucket key also skips the exchange") {
    val facts = (0L until 20000L)
      .map(i => (i % 500, (i % 97).toDouble)).toDF("k", "v")
    facts.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k").saveAsTable("facts_bucketed_agg")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val agg = spark.table("facts_bucketed_agg")
        .groupBy("k").sum("v")
      val exchanges = agg.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        "aggregation on the bucket key planned an exchange")
      assert(agg.count() == 500L)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS facts_bucketed_agg")
    }
  }
}
