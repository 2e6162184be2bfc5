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
    val path = s"$dir/$name.parquet"
    // Schema memo (optimization guide §6 — metadata cost): a bare
    // spark.read.parquet infers the schema EAGERLY at DataFrame creation
    // by reading parquet footers on the driver, and the suite constructs
    // thousands of table loads per bench/verify pass over the same ~10
    // immutable input files. Inferring once per (path, mtime) and
    // replaying via spark.read.schema(...) removes a per-load driver
    // stall without touching the plan: the scan node, pruning and
    // pushdown are identical, only the redundant footer read goes. This
    // is the catalog-metadata discipline every production table format
    // (Iceberg/Delta/Hive metastore) applies at 100 TB — schemas come
    // from metadata, not from re-reading file footers per query. The
    // mtime key keeps test fixtures honest: a rewritten path re-infers.
    val mtime = try new java.io.File(path).lastModified
      catch { case _: Throwable => 0L }
    val key = s"$path@$mtime"
    if (schemaMemo.size > 512) schemaMemo.clear() // test-fixture churn cap
    val schema = schemaMemo.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events") normalizeTs(df) else df
  }

  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

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
