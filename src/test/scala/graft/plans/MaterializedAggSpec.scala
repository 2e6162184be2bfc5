package graft.plans

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The MV rewrite must answer covered aggregations from the view (scan
  * shows the view path, results identical), and must leave everything
  * outside its provable scope untouched. */
class MaterializedAggSpec extends SparkSuite {
  import spark.implicits._

  graft.Tables.configure(spark) // registers the rule on the shared session

  private lazy val (basePath, mvPath): (String, String) = {
    val dir = Files.createTempDirectory("graft_mv")
    val base = s"$dir/base.parquet"
    (0 until 20000)
      .map(i => (s"t${i % 5}", (i % 24).toLong, (i % 997).toLong, i.toDouble))
      .toDF("typ", "hod", "amount", "noise")
      .write.parquet(base)
    (base, s"$dir/mv.parquet")
  }

  private def scansMv(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("mv.parquet")

  private def withMv[A](f: => A): A = {
    MaterializedAgg.create(spark, basePath,
      keys = Seq("typ", "hod"), sumCols = Seq("amount"), mvPath = mvPath)
    try f finally MaterializedAgg.drop(basePath)
  }

  test("covered aggregation reads the view and matches the base scan") {
    val q = () => spark.read.parquet(basePath)
      .groupBy("typ", "hod")
      .agg(count(lit(1)).as("n"), sum("amount").as("s"))
      .orderBy("typ", "hod")
    val direct = q().collect()
    withMv {
      val rewritten = q()
      assert(scansMv(rewritten), rewritten.queryExecution.executedPlan)
      assert(rewritten.collect().toSeq == direct.toSeq)
    }
    // dropped: back to the base scan
    assert(!scansMv(q()))
  }

  test("coarser grouping (key subset) re-aggregates the partials exactly") {
    val q = () => spark.read.parquet(basePath)
      .groupBy("typ")
      .agg(sum("amount").as("s"), count(lit(1)).as("n"))
      .orderBy("typ")
    val direct = q().collect()
    withMv {
      val rewritten = q()
      assert(scansMv(rewritten))
      assert(rewritten.collect().toSeq == direct.toSeq)
    }
  }

  test("uncovered shapes stay on the base table") {
    withMv {
      // non-key grouping column
      assert(!scansMv(spark.read.parquet(basePath)
        .groupBy("amount").agg(count(lit(1)))))
      // uncovered measure column
      assert(!scansMv(spark.read.parquet(basePath)
        .groupBy("typ").agg(sum("noise"))))
      // uncovered aggregate function
      assert(!scansMv(spark.read.parquet(basePath)
        .groupBy("typ").agg(max("amount"))))
      // distinct count is not losslessly re-aggregable
      assert(!scansMv(spark.read.parquet(basePath)
        .groupBy("typ").agg(countDistinct("amount"))))
      // a filter between scan and aggregate needs containment reasoning
      assert(!scansMv(spark.read.parquet(basePath)
        .filter(col("hod") > 5)
        .groupBy("typ").agg(count(lit(1)))))
    }
  }

  test("global (ungrouped) aggregates stay on the base table") {
    // a global count over an empty base must return 0; Sum of partial
    // counts over a zero-row view would return NULL — so ungrouped
    // aggregates are out of scope entirely
    withMv {
      val q = spark.read.parquet(basePath).agg(count(lit(1)).as("n"))
      assert(!scansMv(q))
      assert(q.head().getLong(0) == 20000L)
    }
  }

  test("multi-path scans are never answered from one base's view") {
    val other = basePath.replace("base.parquet", "other.parquet")
    Seq(("t9", 1L, 5L, 0.0)).toDF("typ", "hod", "amount", "noise")
      .write.mode("overwrite").parquet(other)
    withMv {
      val q = spark.read.parquet(basePath, other)
        .groupBy("typ").agg(count(lit(1)).as("n"))
      assert(!scansMv(q), "rows from the second path would silently vanish")
      assert(q.agg(sum("n")).head().getLong(0) == 20001L)
    }
  }

  test("float sum columns are refused at create time") {
    val e = intercept[IllegalArgumentException] {
      MaterializedAgg.create(spark, basePath,
        keys = Seq("typ"), sumCols = Seq("noise"), mvPath = mvPath + "_x")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("downstream operators keep resolving over the rewritten aggregate") {
    withMv {
      val q = spark.read.parquet(basePath)
        .groupBy("typ", "hod")
        .agg(sum("amount").as("s"))
        .filter(col("s") > 0)
        .select((col("s") * 2).as("s2"), col("typ"))
        .orderBy("typ", "s2")
      assert(scansMv(q))
      assert(q.count() == 120)
    }
  }
}
