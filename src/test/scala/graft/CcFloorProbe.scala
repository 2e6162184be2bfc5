package graft

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev probe (Test/runMain graft.CcFloorProbe [sfDir] [query]): counts
  * Spark jobs, stages, tasks and summed task run time for one query run —
  * the load-independent way to A/B a per-round stage-floor change like
  * the r13 observe-on-materialize fold (wall clock on this box swings
  * ±20% with a sibling tenant; stage counts are exact). */
object CcFloorProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val q = if (args.length > 1) args(1) else "q263_dbscan"
    val spark = SparkSuite.session
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      }
    }
    // warm pass (JIT, parquet footers) — not counted
    SparkEntry.queries(q)(spark, sf).write.mode("overwrite")
      .format("noop").save()
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, sf).write.mode("overwrite")
      .format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the async listener bus drain
    spark.sparkContext.removeSparkListener(l)
    println(f"CCPROBE query=$q jobs=${jobs.get} stages=${stages.get} " +
      f"tasks=${tasks.get} task_sec=${taskMs.get / 1e3}%.1f wall=$wall%.2f")
    spark.stop()
  }
}
