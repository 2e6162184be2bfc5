package graft

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Scored, TopKByValue}
import graft.operators.BloomPrune

/** Scale-up sanity: the flagship's aggregation shapes must hold when the
  * input multiplies. Events are self-unioned 8× (~8M rows at sf0.1 scale
  * when the driver runs there; ~8×1k at sf0.001 here) with shifted ids so
  * group count grows too — the plan must stay the same shape (no driver
  * collects, no broadcast of the big side) and finish. Plus adversarial
  * runs of the newest scale operators: top-k under heavy key skew (with a
  * hard shuffle-row-count bound read from the plan's own metrics) and
  * bloom pruning with the filter sized 10× too small. */
class StressSpec extends SparkSuite {

  test("flagship OLS survives an 8x self-union with 8x the groups") {
    val sf = "/root/testdata/sf0.001"
    val base = Tables.load(spark, sf, "events")
    val big = (0 until 8).map(i => base
      .withColumn("user_id", col("user_id") + lit(i * 1000L))
      .withColumn("event_id", col("event_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val users = big.select("user_id").distinct().count()
    val baseUsers = base.select("user_id").distinct().count()
    assert(users == 8 * baseUsers)

    // same shape as q10 but over the synthetic 8x input
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val clean = big.select(col("user_id"), col("ts"), col("event_id"),
        col("value"))
      .withColumn("target", lead("value", 1).over(w))
      .filter(col("target").isNotNull)
    val coef = clean.groupBy("user_id").agg(
      expr("regr_slope(target, value)").as("slope"),
      count(lit(1)).as("n"))
    assert(coef.count() == users)
    // every shifted copy sees identical per-group data → identical slopes
    val distinctSlopes = coef
      .withColumn("orig", col("user_id") % 1000)
      .groupBy("orig").agg(countDistinct(round(col("slope"), 9)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(distinctSlopes == 1L)
  }

  test("skewed top-k: one group holds 50% of rows, shuffle stays bounded") {
    import spark.implicits._
    val n = 100000
    val k = 3
    val tasks = 16
    // group 0 gets every even row (50%); the rest spread over 997 groups
    val df = (0 until n).map { i =>
      (if (i % 2 == 0) 0 else 1 + i % 997, (i * 31 % 9973).toDouble, i.toLong)
    }.toDF("g", "v", "id").repartition(tasks).cache()
    df.count() // materialize so the repartition isn't in the measured job
    val groups = df.select("g").distinct().count()
    // plain ShuffleExchangeExec nodes so the metric read is deterministic
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val topk = udaf(new TopKByValue(k), ExpressionEncoder[Scored]())
      val agg = df.groupBy("g").agg(topk(col("v"), col("id")).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).as("rank"),
          col("col.value").as("v"), col("col.id").as("id"))
      val got = agg.collect()
      // correctness under skew: row-for-row equal to the window form
      val want = df.withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank").cast("int").as("rank"),
          col("v"), col("id"))
        .collect()
      assert(got.toSet == want.toSet)
      // the bound that makes this operator scale: each map task emits at
      // most k rows per group, so the exchange carries ≤ k·groups·tasks
      // rows — the window form would shuffle all n (and all n/2 skewed
      // rows to ONE reducer)
      val written = agg.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s.metrics("shuffleRecordsWritten").value
      }.sum
      assert(written > 0, "expected a measured exchange")
      assert(written <= k * groups * tasks,
        s"shuffle carried $written rows > bound ${k * groups * tasks}")
      assert(written < n / 2,
        s"shuffle carried $written rows — skewed group was not pre-aggregated")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      df.unpersist()
    }
  }

  test("writeZOrdered: two-sided predicate scans a fraction of the rows") {
    // the payoff the Z-order layout exists for, measured end-to-end at
    // sf0.1: the same 100k events written z-clustered vs round-robin, read
    // back with a predicate narrow in BOTH dimensions. Parquet min/max
    // stats skip whole row groups only when the layout makes per-file
    // ranges tight in every filtered column — round-robin files span the
    // full range of both, so they prune nothing.
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("value"),
        graft.functions.Rounding.cents(col("value")).as("vc"))
    val tmp = java.nio.file.Files.createTempDirectory("zprune").toString
    val zDir = s"$tmp/z"
    val plainDir = s"$tmp/plain"
    // user_id < 1500 and vc < 56100 both fit 16 bits; 2 dims x 16 = 32 ≤ 62
    graft.sources.Formats.writeZOrdered(ev, zDir,
      Seq(col("user_id"), col("vc")), bits = 16, numFiles = 16)
    ev.repartition(16).write.parquet(plainDir)

    // plain FileSourceScanExec so the metric read is deterministic
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanned(dir: String): (Set[(Long, Long)], Long) = {
        val df = spark.read.parquet(dir)
          .filter(col("user_id").between(400, 550) &&
            col("value").between(100.0, 160.0))
        val out = df.collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("vc"))).toSet
        val rows = df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.sum
        (out, rows)
      }
      val (zOut, zRows) = scanned(zDir)
      val (pOut, pRows) = scanned(plainDir)
      assert(zOut == pOut && zOut.nonEmpty, "layouts must hold identical data")
      assert(pRows > 0 && zRows > 0, "expected measured scans")
      assert(zRows * 2 <= pRows,
        s"z-clustered scan materialized $zRows rows vs $pRows round-robin — " +
          "row-group stats pruned nothing")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bloom overloaded 10x past expectedItems degrades fpp, not semantics") {
    import spark.implicits._
    // 10k dim keys against a filter sized for 1k — fpp degrades well past
    // its nominal 3%, but a bloom can only false-POSITIVE, so the exact
    // join after it must still produce exactly the plain join's rows
    val dim = (0 until 10000).map(i => (i.toLong * 3, s"d$i")).toDF("k", "name")
    val fact = (0 until 60000).map(i => (i.toLong, i * 1.5)).toDF("fk", "x")
    val pruned = BloomPrune.join(fact, dim, "fk", "k", expectedItems = 1000L)
    val exact = fact.join(dim, fact("fk") === dim("k"))
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
    assert(pruned.count() == 10000L) // fk ∈ {0, 3, …, 29997}: 10k matches
  }
}
