package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

/** One-command demo of the four-stage pipeline over a working directory:
  * `runMain graft.RunPipeline /tmp/zone` builds a deterministic 3-symbol
  * bar fixture (the reference's workload shape: ~150 hourly bars/symbol),
  * runs ingest → transform → combine → predict, and prints the predictions
  * contract. */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse("/tmp/graft_pipeline_demo")
    val spark = GraftSession.builder("local[8]", shufflePartitions = 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    import spark.implicits._

    val bars = (for {
      (sym, base) <- Seq(("AAPL", 180.0), ("MSFT", 400.0), ("GOOG", 140.0))
      t <- 0 until 150
    } yield {
      val drift = 0.05 * t + 3.0 * math.sin(t / 7.0 + base)
      val open = base + drift
      (sym, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(t.toLong)),
        open, open + 1.2, open - 0.8, open + 0.4,
        1000L + (t * 37 % 500))
    }).toDF("symbol", "Datetime", "Open", "High", "Low", "Close", "Volume")

    val predictions = Pipeline.run(spark, bars, workDir)
    predictions.show(truncate = false)
    println(s"zones under $workDir: " +
      new java.io.File(workDir).list().sorted.mkString(", "))
    spark.stop()
  }
}
