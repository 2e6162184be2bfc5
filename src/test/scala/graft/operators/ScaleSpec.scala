package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Scale-mechanics evidence on real data: salting equivalence, bucketed
  * co-located joins (no shuffle), and partition pruning at the scan. */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** collect() that descends into AQE query stages — QueryStageExec and
    * AdaptiveSparkPlanExec are leaf-like nodes whose materialized plans
    * plain collect() never visits. */
  private def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T])
      : Seq[T] = {
    val here = p.collect(pf)
    val nested = p.collect {
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        qs.plan
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
    }
    here ++ nested.flatMap(deepCollect(_)(pf))
  }

  test("SaltedJoin returns exactly the rows of the plain inner join") {
    val events = Tables.load(spark, sf, "events")
    val dim = Seq((0L, "grp0"), (1L, "grp1"), (2L, "grp2"), (7L, "grp7"))
      .toDF("user_id", "grp")
    val plain = events.join(dim, Seq("user_id"), "inner")
      .select("event_id", "grp")
    val salted = SaltedJoin(events, dim, "user_id", salts = 8)
      .select("event_id", "grp")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("connected components converge on 200k nodes / 50k random edges") {
    // dense-cluster shape (what dup graphs look like): deterministic
    // pseudo-random edges inside 4-node id blocks → tiny diameters, a few
    // propagation rounds, distributed the whole way
    val n = 200000L
    val nodes = spark.range(n).toDF("id")
    val edges = spark.range(50000L).select(
      (col("id") * 4).as("a"),
      (col("id") * 4 + pmod(col("id") * 2654435761L, lit(3)) + 1).as("b"))
    val comp = ConnectedComponents.components(nodes, edges, "id", "a", "b")
    assert(comp.count() == n)
    // every labeled component root is the min id of its block of 4
    val bad = comp.filter(col("comp") > col("id") ||
      col("comp") < (col("id") - col("id") % 4)).count()
    assert(bad == 0)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in plan") {
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    orders.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == orders.count()) // every order has a customer
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }

  test("partition pruning: date-partitioned write, pruned scan on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.load(spark, sf, "events")
      .withColumn("d", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("d").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("d") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"))
    // collect() executes this exact plan (count() would build another one),
    // so its scan metrics show what was actually read: 1 partition's file.
    assert(pruned.collect().nonEmpty)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.metrics("numFiles").value == 1L,
      s"expected 1 file read, got ${scan.metrics("numFiles").value}")
  }

  test("dynamic partition pruning: dim-side filter prunes fact partitions " +
      "at runtime") {
    // the 100 TB join pattern: a fact partitioned on the join key, a tiny
    // filtered dim — DPP turns the dim filter into a runtime partition
    // filter on the fact scan, so only matching partitions are read even
    // though the fact-side predicate never appears in the query text
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    spark.range(10000)
      .select(col("id"), (col("id") % 10).as("pk"))
      .repartition(col("pk")) // one file per partition directory
      .write.mode("overwrite").partitionBy("pk").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(10)
      .select(col("id").as("dk"), (col("id") % 5).as("attr"))
    val q = fact.join(dim.filter(col("attr") === 0),
      col("pk") === col("dk"))
    // collect(), not count(): count() builds a separate QueryExecution,
    // and the plan+metrics inspected below must be the EXECUTED one
    assert(q.collect().length == 2000) // dk in {0, 5} -> 2 of 10 parts
    val plan = q.queryExecution.executedPlan
    val scan = deepCollect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("PartitionFilters")
            .exists(_.contains("dynamicpruning")) => s
    }.headOption.getOrElse(
      fail(s"no DPP partition filter on the fact scan:\n$plan"))
    assert(scan.metrics("numFiles").value == 2L, // 2 of 10 partitions
      s"DPP did not prune: ${scan.metrics("numFiles").value} files read")
  }

  test("AQE skew join splits the hot key's partition at runtime") {
    // the runtime complement to SaltedJoin: no query rewrite, AQE detects
    // the oversized partition from map output stats and fans it out
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries ~300k rows; keys 0..99 get one straggler each
      val fact = spark.range(300000)
        .select(when(col("id") < 299900, lit(0L))
          .otherwise(col("id") % 100).as("k"), col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("d"), col("id").cast("string")).as("attr"))
      // plain join result — a downstream aggregate on the join key would
      // make AQE SKIP the split (it preserves required distributions
      // unless forceOptimizeSkewedJoin); collect() executes q's OWN
      // QueryExecution (count() would build another)
      val q = fact.join(dim, "k")
      assert(q.collect().length == 300000)
      val plan = q.queryExecution.executedPlan
      val skewed = deepCollect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.isSkewJoin => j
      }
      assert(skewed.nonEmpty, s"no skew-split join in final plan:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("approximate distinct (HLL) within 5% of exact") {
    val events = Tables.load(spark, sf, "events")
    val r = events.agg(
      approx_count_distinct("event_id").as("approx"),
      countDistinct("event_id").as("exact")).head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
