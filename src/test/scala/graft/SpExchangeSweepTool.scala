package graft

/** Dev tool (Test/runMain graft.SpExchangeSweepTool): print every
  * declared query's nonzero single-partition-exchange count as a
  * ready-to-paste pin-map body for PlanSpec's exchange gate — a thin
  * alias of [[PlanCounterSweepTool]] kept because the gate's failure
  * message names this tool. */
object SpExchangeSweepTool {
  def main(args: Array[String]): Unit =
    PlanCounterSweepTool.main("single_partition_exchanges" +: args)
}
