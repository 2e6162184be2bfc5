package graft

/** Dev tool (Test/runMain graft.WindowSweepTool): print every declared
  * query's nonzero partition-less-window count as a ready-to-paste
  * allowlist body for PlanSpec's window gate — a thin alias of
  * [[PlanCounterSweepTool]] kept because the gate's failure message
  * names this tool. Run after intentionally adding a bounded-frame
  * global window, paste, re-run the spec. */
object WindowSweepTool {
  def main(args: Array[String]): Unit =
    PlanCounterSweepTool.main("unpartitioned_windows" +: args)
}
