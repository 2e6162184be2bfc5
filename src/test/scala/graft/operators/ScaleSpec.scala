package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** Scale-mechanics evidence on real data: salting equivalence, bucketed
  * co-located joins (no shuffle), and partition pruning at the scan. */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

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
      .write.mode("overwrite").partitionBy("pk").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(10)
      .select(col("id").as("dk"), (col("id") % 5).as("attr"))
    val q = fact.join(dim.filter(col("attr") === 0),
      col("pk") === col("dk"))
    assert(q.count() == 2000) // dk in {0, 5} -> 2 of 10 partitions
    // AQE wraps the join; the materialized fact scan lives in the final
    // adaptive plan, not the pre-execution wrapper's leaves
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("PartitionFilters")
            .exists(_.contains("dynamicpruning")) => s
    }.headOption.getOrElse(
      fail(s"no DPP partition filter on the fact scan:\n$plan"))
    assert(scan.metrics("numFiles").value <= 4L, // 2 partitions' files
      s"DPP did not prune: ${scan.metrics("numFiles").value} files read")
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
