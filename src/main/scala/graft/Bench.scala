package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/session warmup: exercise the machinery the timed queries
    // use (hash agg, collect_set, window, shuffle join, explode, regex
    // split, md5, parquet reader) on synthetic data so the first heavy
    // query isn't charged for one-time JIT/codegen initialization. Every
    // query is still measured in full afterwards.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = spark.range(200000).selectExpr(
        "id", "cast(id % 997 as string) as k", "cast(id % 31 as double) as v")
      w.groupBy("k").agg(count(lit(1)), sum("v"), collect_set("id")).count()
      w.withColumn("rn",
          row_number().over(Window.partitionBy("k").orderBy(col("v"), col("id"))))
        .filter(col("rn") === 1).count()
      w.join(w.groupBy("k").count(), "k").count()
      spark.range(2000)
        .selectExpr("explode(split(repeat('a b c d e ', 40), ' ')) as t")
        .select(md5(col("t"))).distinct().count()
      // native LSH banding codegen (the ANN/near-dup family's hot path)
      val planes = graft.operators.Lsh.hyperplanes(128, 64)
      spark.range(500)
        .selectExpr("id as vec_id",
          "transform(sequence(1, 64), i -> cast(i * (id % 7 + 1) as double)) as v")
        .select(col("vec_id"),
          posexplode(graft.operators.Lsh.bandKeysCol(col("v"), planes, 32, 4)))
        .toDF("vec_id", "band", "bkey")
        .groupBy("band", "bkey").count().count()
      try spark.read.parquet(s"$sfDir/region.parquet").count()
      catch { case _: Throwable => () }
    }
    var failed = List.empty[String]
    // sorted execution order: Map iteration order shifts as queries are
    // added, which moves which query absorbs residual warmup and makes
    // per-query numbers incomparable across rounds.
    // best-of-2 per query, INTERLEAVED (A…Z then A…Z, min per query):
    // a single pass cannot distinguish a code regression from transient
    // machine contention (round 4's numbers swung >20x both ways on
    // untouched code), and back-to-back repeats of the same query share
    // one contention window, so a multi-minute load spike poisons both
    // samples at once (round 5). Separating a query's two samples by the
    // full suite length (~minutes) makes the min robust to any spike
    // shorter than a whole pass; both raw readings ride along so a
    // contended pass is still visible in the artifact.
    val passes = 2
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = (1 to passes).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => if (!failed.contains(name)) failed ::= name }
        (System.nanoTime() - t0) / 1e9
      }
    }
    val results = ordered.zipWithIndex.map { case ((name, _), i) =>
      val times = samples.map(_(i))
      (name, times.min, times)
    }
    // a failed query must be visible, not silently counted as a fast run:
    // its per-query entry is null (error-fast wall times would understate
    // it) and it contributes nothing to the total, so the total stays
    // comparable across rounds as the set of passing queries
    val qs = results.map { case (k, v, _) =>
      val cell = if (failed.contains(k)) "null" else v.toString
      s"\"" + k + "\":" + cell
    }.mkString("{", ",", "}")
    val qsRaw = results.map { case (k, _, ts) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total =
      results.collect { case (k, v, _) if !failed.contains(k) => v }.sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // machine-contention telemetry: a contended box (round-2's 91.8s vs a
    // quiet 51.9s on identical code) is self-identifying when the 1-minute
    // load average rides along with the numbers
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val hostCpus = Runtime.getRuntime.availableProcessors
    val ok = failed.isEmpty
    val line = s"""{"metric":"total","value":$total,"unit":"sec","ok":$ok,"queries":$qs,"queries_raw":$qsRaw,"passes":$passes,"failed":$failedJson,"sf":"$sfDir","load_avg":$loadAvg,"host_cpus":$hostCpus}"""
    println(line)
    // the driver snapshots stdout through a tail that has truncated the
    // per-query JSON in past rounds (losing q01–q38); the full line also
    // lands in a file so round-over-round comparisons never depend on
    // tail length
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")), line)
    catch { case _: Throwable => () } // file write is best-effort telemetry
    spark.stop()
    // a bench with failed queries must not read as a clean success to the
    // harness (round 7's rc=0 masked two real regressions)
    if (!ok) sys.exit(1)
  }
}
