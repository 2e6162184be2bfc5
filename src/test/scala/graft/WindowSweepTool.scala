package graft

import graft.operators.PlanAudit

/** Dev tool (Test/runMain graft.WindowSweepTool): sweep EVERY declared
  * query's static plan and print the ones containing a partition-less
  * window ([[PlanAudit.Audit.unpartitionedWindows]]), as a ready-to-paste
  * allowlist body for PlanSpec's window gate. Run after intentionally
  * adding a bounded-frame global window, paste, re-run the spec. */
object WindowSweepTool {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSuite.session
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val a =
        try PlanAudit.of(fn(spark, sf))
        catch { case e: Throwable =>
          println(s"    // $name: audit failed: ${e.getMessage}")
          PlanAudit.Audit(0, 0, 0, 0, 0, 0, 0)
        }
      if (a.unpartitionedWindows > 0)
        println(s"""    "$name" -> ${a.unpartitionedWindows}L,""")
    }
    println("    // [end of sweep]")
    spark.stop()
  }
}
