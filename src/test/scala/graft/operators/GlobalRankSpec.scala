package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[GlobalRank]] — the distributed global-rank operator must agree with
  * the single-partition window builtins bit-for-bit, under any partition
  * count. */
class GlobalRankSpec extends SparkSuite {

  import spark.implicits._

  private def fixture = (1 to 997).map(i => ((i * 7919) % 1000, i))
    .toDF("v", "id")

  test("withRank equals row_number() over the same total order") {
    val got = GlobalRank.withRank(fixture, "rnk", col("v").desc, col("id"))
      .select("id", "rnk")
    val want = fixture.withColumn("rnk",
        row_number().over(Window.orderBy(col("v").desc, col("id")))
          .cast("long"))
      .select("id", "rnk")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("rank is independent of the shuffle partition count") {
    val a = GlobalRank.withRank(fixture, "rnk", col("v"), col("id"))
      .select("id", "rnk").collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val b = GlobalRank.withRank(fixture, "rnk", col("v"), col("id"))
        .select("id", "rnk").collect().map(r => (r.getInt(0), r.getLong(1)))
        .sortBy(_._1)
      assert(a.sameElements(b))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("bucketOf reproduces ntile() for ragged and exact splits") {
    for (n <- Seq(7, 10, 97, 100, 101); k <- Seq(3, 10)) {
      val df = (1 to n).map(i => (i, i)).toDF("v", "id")
      val got = df.select(col("id"),
        GlobalRank.bucketOf(col("id").cast("long"), lit(n.toLong), k)
          .as("b"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy("id")).cast("long").as("b"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }
}
