package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Fixed-point Lloyd's: must separate obvious blobs, be bit-deterministic
  * across partitionings, shrink away emptied clusters, and keep exact
  * integer distances. */
class KMeansSpec extends SparkSuite {
  import spark.implicits._

  // two tight blobs around (0,0) and (10,10), 20 points each
  private def blobs = (0 until 40).map { i =>
    val base = if (i < 20) 0.0 else 10.0
    (i.toLong, Seq(base + (i % 5) * 0.01, base + (i % 3) * 0.01))
  }.toDF("id", "v")

  test("two blobs, k=2: every point lands with its blob") {
    val (cents, asg) = KMeans.fit(blobs, "id", "v", dim = 2, k = 2, iters = 3)
    assert(cents.count() == 2)
    val byCluster = asg.groupBy("cid")
      .agg(min("vid").as("lo"), max("vid").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // one cluster holds exactly ids 0-19, the other 20-39
    assert(byCluster === Set((0L, 19L, 20L), (20L, 39L, 20L)))
    // centroids sit near the blob centers (quantized at 1e6)
    val cq = cents.select(expr("cq[1]")).as[Long].collect().sorted
    assert(cq(0) > -100000 && cq(0) < 100000)      // ~0.0 blob
    assert(cq(1) > 9900000 && cq(1) < 10100000)    // ~10.0 blob
  }

  test("bit-deterministic across partitionings") {
    def run(parts: Int): Set[(Long, Long, Long)] = {
      val (_, asg) = KMeans.fit(
        blobs.repartition(parts), "id", "v", dim = 2, k = 3, iters = 2)
      asg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(run(1) === run(17))
  }

  test("clusters that lose all members vanish (Lloyd shrink)") {
    // 3 identical points: seeds are 3 distinct ids but all coordinates
    // equal, so after one round every point assigns to the min-id centroid
    val pts = Seq((1L, Seq(5.0, 5.0)), (2L, Seq(5.0, 5.0)),
      (3L, Seq(5.0, 5.0))).toDF("id", "v")
    val (cents, asg) = KMeans.fit(pts, "id", "v", dim = 2, k = 3, iters = 2)
    assert(cents.count() == 1)
    assert(asg.select("cid").distinct().count() == 1)
    assert(asg.agg(sum("dist")).as[Long].head() == 0L)
  }

  test("empty input yields empty output") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val (cents, asg) = KMeans.fit(empty, "id", "v", dim = 2, k = 4, iters = 1)
    assert(cents.isEmpty && asg.isEmpty)
  }

  test("sqDist is the exact integer squared L2") {
    val d = Seq((Seq(1L, 2L, 3L), Seq(4L, 0L, 3L))).toDF("a", "b")
      .select(KMeans.sqDist(col("a"), col("b"))).as[Long].head()
    assert(d == 9L + 4L + 0L)
  }

  test("assignment plan broadcasts the centroid side") {
    val (cents, asg) = KMeans.fit(blobs, "id", "v", dim = 2, k = 2, iters = 1)
    val plan = asg.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"centroids were not broadcast:\n$plan")
  }
}
