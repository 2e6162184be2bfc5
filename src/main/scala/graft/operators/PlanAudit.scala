package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CollapseCodegenStages, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, EnsureRequirements, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan shape statistics as data — the library form of the plan
  * assertions a scale-conscious team otherwise hand-writes in tests
  * (PlanSpec-style). `audit` compiles the query (no execution) and counts
  * the operators whose presence or absence IS the 100 TB posture:
  * shuffle exchanges (each one a full-data network pass), broadcasts,
  * file scans, cartesian products / nested-loop joins (the shapes that
  * cannot survive a scale-up), and whole-stage-codegen coverage. CI then
  * gates on `shuffles <= k && cartesians == 0` instead of grepping
  * explain text.
  *
  * Works on the pre-AQE physical plan (the static shape — AQE's runtime
  * re-plans depend on sizes, so gating on them would make tests
  * data-dependent); AQE wrapper nodes are unwrapped, not counted.
  */
object PlanAudit {

  final case class Audit(
      shuffles: Long, broadcasts: Long, scans: Long,
      cartesians: Long, nestedLoopJoins: Long,
      codegenSpans: Long, nodes: Long)

  /** Walk every node of the compiled physical plan, including the plans
    * nested inside AQE wrappers and subquery expressions. */
  def of(df: DataFrame): Audit = {
    var shuffles, broadcasts, scans, cartesians, bnlj, codegen, nodes = 0L
    def walk(p: SparkPlan): Unit = {
      val unwrapped = p match {
        // AQE defers plan preparation: inputPlan has neither exchanges
        // nor codegen spans yet — run the two preparation rules the
        // non-adaptive path would have run, so the audited shape is the
        // static pre-runtime plan (what PlanSpec-style assertions read)
        case a: AdaptiveSparkPlanExec =>
          CollapseCodegenStages()(EnsureRequirements()(a.inputPlan))
        case other => other
      }
      unwrapped.foreach { n =>
        nodes += 1
        n match {
          case _: ShuffleExchangeLike => shuffles += 1
          case _: BroadcastExchangeLike => broadcasts += 1
          case _: CartesianProductExec => cartesians += 1
          case _: BroadcastNestedLoopJoinExec => bnlj += 1
          case _: WholeStageCodegenExec => codegen += 1
          case f if f.nodeName.contains("Scan") => scans += 1
          case _ => ()
        }
        n.subqueries.foreach(walk)
      }
    }
    walk(df.queryExecution.executedPlan)
    Audit(shuffles, broadcasts, scans, cartesians, bnlj, codegen, nodes)
  }

  /** The audit as a 1-row DataFrame, for dashboards / CI artifacts. */
  def audit(df: DataFrame): DataFrame = {
    val a = of(df)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((a.shuffles, a.broadcasts, a.scans, a.cartesians,
      a.nestedLoopJoins, a.codegenSpans, a.nodes))
      .toDF("shuffles", "broadcasts", "scans", "cartesians",
        "nested_loop_joins", "codegen_spans", "nodes")
  }
}
