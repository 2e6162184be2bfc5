package graft

import graft.operators.PlanAudit

/** Dev tool (Test/runMain graft.PlanPinTool): re-measure the static
  * shuffle counts [[PlanGateSpec]] pins, printing a ready-to-paste map
  * body. Run after an intentional plan change, paste, re-run the spec. */
object PlanPinTool {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSuite.session
    PlanGateSpec.measured.keys.toSeq.sorted.foreach { name =>
      val a = PlanAudit.of(SparkEntry.queries(name)(spark, sf))
      println(s"""    "$name" -> ${a.shuffles}L, // cartesians=${a.cartesians}""")
    }
    spark.stop()
  }
}
