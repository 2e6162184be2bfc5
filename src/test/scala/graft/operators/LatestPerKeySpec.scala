package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class LatestPerKeySpec extends SparkSuite {
  import spark.implicits._

  test("keeps only rows with the max ordering tuple per key") {
    val df = Seq(
      ("a", 1L, "f1", 10), ("a", 2L, "f2", 20), ("a", 2L, "f2", 21),
      ("b", 5L, "f9", 30)
    ).toDF("sym", "mt", "path", "v")
    val out = LatestPerKey(df, col("sym"), col("mt"), col("path"))
      .orderBy("sym", "v").collect()
    assert(out.map(_.getInt(3)).toSeq == Seq(20, 21, 30))
  }

  test("tie on first ordering column broken by the second") {
    val df = Seq(("a", 2L, "f1", 1), ("a", 2L, "f2", 2))
      .toDF("sym", "mt", "path", "v")
    val out = LatestPerKey(df, col("sym"), col("mt"), col("path")).collect()
    assert(out.map(_.getInt(3)).toSeq == Seq(2))
  }
}
