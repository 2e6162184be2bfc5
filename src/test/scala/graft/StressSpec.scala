package graft

import org.apache.spark.sql.functions._

/** Scale-up sanity: the flagship's aggregation shapes must hold when the
  * input multiplies. Events are self-unioned 8× (~8M rows at sf0.1 scale
  * when the driver runs there; ~8×1k at sf0.001 here) with shifted ids so
  * group count grows too — the plan must stay the same shape (no driver
  * collects, no broadcast of the big side) and finish. */
class StressSpec extends SparkSuite {

  test("flagship OLS survives an 8x self-union with 8x the groups") {
    val sf = "/root/testdata/sf0.001"
    val base = Tables.load(spark, sf, "events")
    val big = (0 until 8).map(i => base
      .withColumn("user_id", col("user_id") + lit(i * 1000L))
      .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val users = big.select("user_id").distinct().count()
    val baseUsers = base.select("user_id").distinct().count()
    assert(users == 8 * baseUsers)

    // same shape as q10 but over the synthetic 8x input
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val clean = big.select(col("user_id"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("target", lead("value", 1).over(w))
      .filter(col("target").isNotNull)
    val coef = clean.groupBy("user_id").agg(
      expr("regr_slope(target, value)").as("slope"),
      count(lit(1)).as("n"))
    assert(coef.count() == users)
    // every shifted copy sees identical per-group data → identical slopes
    val distinctSlopes = coef
      .withColumn("orig", col("user_id") % 1000)
      .groupBy("orig").agg(countDistinct(round(col("slope"), 9)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(distinctSlopes == 1L)
  }
}
