package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over a scale-factor directory (TESTDATA.md) and the
  * one place session confs every query relies on are pinned.
  *
  * Confs are set at runtime (all three are runtime-settable) so queries behave
  * identically whether run through Verify, Bench, a test suite, or the
  * driver's own session:
  *  - `ansi.enabled=false`: the reference tolerates malformed values by
  *    null-ing them (e.g. Polars `strptime(strict=False)`,
  *    reference `scripts/transform.py:47`), so casts/parses must be
  *    null-on-failure, not error.
  *  - UTC session TZ: timestamp→string formatting must agree with the
  *    DuckDB oracle.
  *  - AQE on: runtime shuffle coalescing + skew-join handling — part of the
  *    100 TB posture.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    // for: read it as raw nanos and convert below (exact integer µs
    // truncation — same value DuckDB produces for its µs timestamps).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.expressions.CosineSimilarity.register(spark)
    graft.expressions.Gcd.register(spark)
    // runtime twin of GraftExtensions' injectOptimizerRule, for sessions
    // not built via GraftSession (same pattern as AsofJoin.ensureStrategy)
    val rules = Seq(graft.plans.ApproxDistinctRewrite(),
      graft.plans.MaterializedAgg.Rewrite())
    rules.foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
  }

  /** Load one table; column pruning + predicate pushdown reach the parquet
    * scan because this is a plain lazy `spark.read.parquet`.
    *
    * events.ts normalization: the generator has shipped the column as
    * parquet TIMESTAMP(NANOS) (read as raw Long via nanosAsLong) and as
    * TIMESTAMP(MICROS) without isAdjustedToUTC (read as TIMESTAMP_NTZ).
    * Both are normalized to session-TZ TimestampType here so every
    * downstream operator sees ONE stable type across data drops; under
    * the pinned UTC session the NTZ→TZ conversion is value-identity. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize an events-shaped frame's `ts` to session-TZ TimestampType,
    * whatever physical type the generator shipped (raw nanos Long or
    * TIMESTAMP_NTZ). Public so streaming readers over the same files can
    * apply the identical rule.
    *
    * The NTZ→TimestampType cast below is value-identity ONLY when the
    * session TZ is UTC, so this method pins the session confs itself
    * (configure is idempotent) — a caller that skips [[load]] cannot get
    * a silent wall-clock shift. */
  def normalizeTs(df: DataFrame): DataFrame = {
    configure(df.sparkSession)
    normalizeTs0(df)
  }

  private def normalizeTs0(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", org.apache.spark.sql.functions
        .expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", org.apache.spark.sql.functions
        .col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }
}
