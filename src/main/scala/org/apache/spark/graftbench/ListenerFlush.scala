package org.apache.spark.graftbench

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for [[graft.Bench]]'s per-query
  * memory attribution: task-metric events (spill bytes, peak execution
  * memory) are delivered asynchronously, so without a drain a query's
  * tail events could be attributed to the NEXT query's window. Lives
  * under `org.apache.spark` because `SparkContext.listenerBus` is
  * `private[spark]` — the standard shim for a capability the public
  * API doesn't expose (compiled against the public Spark jars only). */
object ListenerFlush {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
