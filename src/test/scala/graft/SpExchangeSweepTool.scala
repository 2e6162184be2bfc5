package graft

import graft.operators.PlanAudit

/** Dev tool (Test/runMain graft.SpExchangeSweepTool): sweep EVERY
  * declared query's static plan and print the ones containing a
  * single-partition exchange ([[PlanAudit.Audit.singlePartitionExchanges]])
  * as a ready-to-paste pin-map body for PlanSpec's exchange gate. Run
  * after an intentional plan change, paste, re-run the spec. Audit
  * failures are loud (stderr + nonzero exit) — a silently-absent entry
  * would under-pin (the WindowSweepTool lesson, ADVICE r15). */
object SpExchangeSweepTool {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSuite.session
    var failures = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val a = PlanAudit.of(fn(spark, sf))
        if (a.singlePartitionExchanges > 0)
          println(s"""      "$name" -> ${a.singlePartitionExchanges}L,""")
      } catch { case e: Throwable =>
        failures += 1
        println(s"      // $name: AUDIT FAILED — entry missing: " +
          s"${e.getMessage}")
        System.err.println(s"[sp-exchange-sweep] $name audit failed: $e")
      }
    }
    println(if (failures == 0) "      // [end of sweep]"
      else s"      // [end of sweep — INCOMPLETE: $failures failure(s)]")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
