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
    // a query that fails to AUDIT is absent from the paste-ready list
    // even if it contains partition-less windows — that absence must be
    // loud (stderr + nonzero exit), or a developer trusting the printed
    // allowlist under-allowlists and mis-attributes the PlanSpec failure
    var failures = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val a = PlanAudit.of(fn(spark, sf))
        if (a.unpartitionedWindows > 0)
          println(s"""    "$name" -> ${a.unpartitionedWindows}L,""")
      } catch { case e: Throwable =>
        failures += 1
        println(s"    // $name: AUDIT FAILED — entry missing: " +
          s"${e.getMessage}")
        System.err.println(s"[window-sweep] $name audit failed: $e")
      }
    }
    println(if (failures == 0) "    // [end of sweep]"
      else s"    // [end of sweep — INCOMPLETE: $failures audit failure(s)]")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
