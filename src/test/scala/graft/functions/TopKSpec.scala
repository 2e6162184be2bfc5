package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** TopKByValue must equal the window-rank formulation row-for-row, and its
  * plan must partial-aggregate (the whole point: the exchange carries at
  * most k rows per group per map task, not the full table). */
class TopKSpec extends SparkSuite {
  import spark.implicits._

  private def topk(k: Int) = udaf(new TopKByValue(k), ExpressionEncoder[Scored]())

  private def viaAggregate(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(topk(k)(col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.value").as("v"), col("col.id").as("id"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("int").as("rank"), col("v"), col("id"))

  test("equals the window-rank formulation, including ties") {
    // duplicate values force the id tiebreak; group 2 has fewer than k rows
    val df = Seq(
      (1, 5.0, 10L), (1, 5.0, 3L), (1, 7.0, 9L), (1, 1.0, 1L), (1, 7.0, 2L),
      (2, 4.0, 8L), (2, 4.0, 7L),
      (3, -1.0, 5L), (3, -2.0, 6L), (3, 0.0, 4L), (3, -1.0, 2L))
      .toDF("g", "v", "id").repartition(4)
    for (k <- Seq(1, 3, 100)) {
      val a = viaAggregate(df, k)
      val w = viaWindow(df, k)
      assert(a.exceptAll(w).isEmpty && w.exceptAll(a).isEmpty,
        s"k=$k mismatch")
    }
  }

  test("reduce keeps the buffer bounded and ordered; merge respects the " +
      "same ordering") {
    val agg = new TopKByValue(2)
    val full = Seq(Scored(9.0, 1L), Scored(8.0, 2L))
    // can't displace: equal value, higher id than the worst kept row
    assert(agg.reduce(full, Scored(8.0, 5L)) == full)
    // displaces on id tiebreak
    assert(agg.reduce(full, Scored(8.0, 0L)) ==
      Seq(Scored(9.0, 1L), Scored(8.0, 0L)))
    assert(agg.merge(full, Seq(Scored(10.0, 3L))).head == Scored(10.0, 3L))
    assert(agg.merge(full, full).size == 2)
  }

  test("plan partial-aggregates: two aggregate stages around one exchange") {
    val df = (0 until 64).map(i => (i % 4, i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val plan = df.groupBy("g").agg(topk(3)(col("v"), col("id")).as("top"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(g"))
  }
}
