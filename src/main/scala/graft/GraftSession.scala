package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession builder with the engine's
  * session defaults applied. All of these matter at cluster scale and are
  * the same knobs a 1000-executor deployment would set:
  *
  *  - shuffle partitions sized to the parallelism at hand (not the 200
  *    default);
  *  - AQE on, with coalescing and skew-join splitting (runtime re-plan);
  *  - 128 MiB file split targets so scan tasks stay balanced;
  *  - ANSI off + UTC to match the engine's null-on-failure parse semantics
  *    and oracle formatting;
  *  - the engine's extensions (native functions) injected.
  */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def get(master: String = "local[*]"): SparkSession = {
    val s = builder(master).getOrCreate()
    Tables.configure(s)
    s
  }
}
