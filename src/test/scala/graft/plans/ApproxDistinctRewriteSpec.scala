package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The opt-in AQP rewrite: exact by default, sketched under the flag, with
  * the flag's error bounded and non-Count distincts untouched. */
class ApproxDistinctRewriteSpec extends SparkSuite {
  import spark.implicits._

  private val flag = "spark.graft.approxDistinct.enabled"

  graft.Tables.configure(spark) // registers the rule on the shared session

  private def withFlag[A](on: Boolean)(f: => A): A = {
    spark.conf.set(flag, on.toString)
    try f finally spark.conf.unset(flag)
  }

  private def df = (0 until 10000)
    .map(i => (i % 7, (i % 1000).toLong)).toDF("g", "x")

  test("rule applied directly rewrites the analyzed plan") {
    withFlag(on = true) {
      val analyzed = df.groupBy("g").agg(countDistinct("x").as("d"))
        .queryExecution.analyzed
      val out = ApproxDistinctRewrite().apply(analyzed).toString
      assert(out.contains("approx_count_distinct"), out)
    }
    assert(spark.experimental.extraOptimizations.nonEmpty,
      "rule not registered on the session")
  }

  test("disabled (default): plan and result stay exact") {
    val q = df.groupBy("g").agg(countDistinct("x").as("d"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("approx_count_distinct"), plan)
    assert(q.collect().map(_.getLong(1)).toSet === Set(1000L))
  }

  test("enabled: optimizer swaps in HLL++ and the estimate lands within " +
      "the rsd band") {
    withFlag(on = true) {
      val q = df.groupBy("g").agg(countDistinct("x").as("d"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), plan)
      q.collect().map(_.getLong(1)).foreach { est =>
        assert(math.abs(est - 1000L) <= 50L, s"estimate $est off by >5%")
      }
    }
  }

  test("enabled: the flag is session-scoped and resets") {
    withFlag(on = true) {
      assert(df.agg(countDistinct("x")).queryExecution.optimizedPlan
        .toString.contains("approx_count_distinct"))
    }
    assert(!df.agg(countDistinct("x")).queryExecution.optimizedPlan
      .toString.contains("approx_count_distinct"))
  }

  test("enabled: sum(DISTINCT) and multi-column distinct keep exact " +
      "semantics") {
    withFlag(on = true) {
      val sumQ = df.agg(sum_distinct(col("x")).as("s"))
      assert(!sumQ.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(sumQ.head().getLong(0) == (0 until 1000).sum.toLong)
      val multi = df.agg(countDistinct(col("g"), col("x")).as("d"))
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(multi.head().getLong(0) == 7000L)
    }
  }

  test("enabled: explicit exact queries via approx flag do not break " +
      "grouped exactness elsewhere") {
    withFlag(on = true) {
      // a query with no distinct count is completely untouched
      val q = df.groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("s"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"), plan)
      assert(q.agg(sum("n")).head().getLong(0) == 10000L)
    }
  }
}
