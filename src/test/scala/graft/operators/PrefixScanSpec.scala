package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[PrefixScan]] must agree bit-for-bit with the single-partition
  * running-window builtins, under any partition count. */
class PrefixScanSpec extends SparkSuite {

  import spark.implicits._

  private def fixture = (1 to 1013)
    .map(i => (i, ((i * 2654435761L) % 1000) - 300))
    .toDF("id", "v")
    .select(col("id"), col("v").cast("long").as("v"))

  private val w = Window.orderBy("id")
    .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  test("runningSum equals sum() over an unbounded-preceding window") {
    val got = PrefixScan.runningSum(fixture, "v", "cum", col("id"))
      .select("id", "cum")
    val want = fixture.select(col("id"), sum("v").over(w).as("cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("runningMin equals min() over an unbounded-preceding window") {
    val got = PrefixScan.runningMin(fixture, "v", "m", col("id"))
      .select("id", "m")
    val want = fixture.select(col("id"), min("v").over(w).as("m"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("runningSums: one pass equals row_number() plus sum() windows") {
    val got = PrefixScan.runningSums(
      fixture.withColumn("one", lit(1L)),
      Seq("one" -> "k", "v" -> "cum"), col("v").desc, col("id"))
      .select("id", "k", "cum")
    val ww = Window.orderBy(col("v").desc, col("id"))
    val want = fixture.select(col("id"),
      row_number().over(ww).cast("long").as("k"),
      sum("v").over(ww.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("cum"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("scan is independent of the shuffle partition count") {
    val a = PrefixScan.runningSum(fixture, "v", "cum", col("id"))
      .select("id", "cum").collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = PrefixScan.runningSum(fixture, "v", "cum", col("id"))
        .select("id", "cum").collect().map(r => (r.getInt(0), r.getLong(1)))
        .sortBy(_._1)
      assert(a.sameElements(b))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
