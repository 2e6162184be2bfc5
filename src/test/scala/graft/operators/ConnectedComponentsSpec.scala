package graft.operators

import graft.SparkSuite

/** Min-label propagation: multi-hop chains (propagation must iterate),
  * disjoint components, isolated nodes, and non-convergence detection. */
class ConnectedComponentsSpec extends SparkSuite {

  private def comp(nodes: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 50): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.components(
      nodes.toDF("id"), edges.toDF("a", "b"), "id", "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 6-node path collapses to one component (needs several rounds)") {
    val got = comp(0L to 5L, Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L)))
    assert(got == (0L to 5L).map(_ -> 0L).toMap)
  }

  test("disjoint components and isolated nodes keep separate labels") {
    // component {1,2,3} via chain, {10,11} via edge, 20 isolated
    val got = comp(Seq(1L, 2L, 3L, 10L, 11L, 20L),
      Seq((3L, 2L), (2L, 1L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("transitive closure: A~B, B~C clusters A with C without an A~C edge") {
    val got = comp(Seq(7L, 8L, 9L), Seq((7L, 8L), (8L, 9L)))
    assert(got(9L) == 7L)
  }

  test("undeclared edge endpoints propagate labels instead of faking convergence") {
    // node 2 is absent from the vertex set but bridges 3 to 1: its
    // first-appearance round must count as a change, or the loop would
    // stop with 3 still labeled 3
    val got = comp(Seq(1L, 3L), Seq((3L, 2L), (2L, 1L)))
    assert(got(3L) == 1L && got(1L) == 1L && got(2L) == 1L)
  }

  test("duplicate ids in the vertex set still yield one row per id") {
    val got = comp(Seq(1L, 1L, 2L, 2L, 5L), Seq((1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    val s = spark
    import s.implicits._
    val n = ConnectedComponents.components(
      Seq(1L, 1L, 2L).toDF("id"), Seq((1L, 2L)).toDF("a", "b"),
      "id", "a", "b").count()
    assert(n == 2, s"expected one row per distinct id, got $n")
  }

  test("high-diameter chain falls back to alternating star in O(log n) rounds") {
    // a 201-node path has diameter 200 — min-label would need 200 rounds,
    // far past the 15-round fallback point; alternating large/small-star
    // must finish the job within the default maxIter=50 budget AND in a
    // logarithmic round count (the whole point of the fallback)
    val s = spark
    import s.implicits._
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    ConnectedComponents.lastStarRounds = -1
    val result = ConnectedComponents.components(
      (0L to 200L).toDF("id"),
      (0L until 200L).map(i => (i + 1, i)).toDF("a", "b"), "id", "a", "b")
    val got = result.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 200L).map(_ -> 0L).toMap)
    // the batched loop must have spent exactly the 15-round budget before
    // handing over (batching may not silently shrink the cap)
    assert(ConnectedComponents.lastPropRounds == 15,
      s"expected the full 15-round propagation budget, " +
        s"got ${ConnectedComponents.lastPropRounds}")
    val rounds = ConnectedComponents.lastStarRounds
    assert(rounds > 0, "star fallback did not run for a diameter-200 graph")
    assert(rounds <= 15, s"star took $rounds rounds on 201 nodes — not O(log n)")
    // the result itself is persisted BY CONTRACT (caller releases it);
    // everything else — propagation rounds, star rounds, edge caches —
    // must already be gone
    result.unpersist(blocking = true)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty, s"star fallback leaked cached RDDs: $leaked")
  }

  test("star fallback keeps disjoint components and singletons separate") {
    // two long chains + an isolated node: the star path must not merge
    // components or drop declared singletons when it re-anchors labels
    val chainA = (0L until 30L).map(i => (i + 1, i))
    val chainB = (100L until 130L).map(i => (i + 1, i))
    ConnectedComponents.lastStarRounds = -1
    val got = comp((0L to 30L) ++ (100L to 130L) :+ 999L, chainA ++ chainB)
    assert(ConnectedComponents.lastStarRounds > 0, "expected the star path")
    assert((0L to 30L).forall(got(_) == 0L))
    assert((100L to 130L).forall(got(_) == 100L))
    assert(got(999L) == 999L)
  }

  test("a low forced cap still takes the star path and stays correct — " +
    "the cap is a budget, not a correctness knob") {
    val s = spark
    import s.implicits._
    ConnectedComponents.lastStarRounds = -1
    // per-call parameter, not a global var (ADVICE r12): lowering the cap
    // here cannot change CC pacing for any concurrently-running suite
    val got = ConnectedComponents.components(
      (0L to 5L).toDF("id"),
      Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L)).toDF("a", "b"),
      "id", "a", "b", starFallbackAt = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ConnectedComponents.lastStarRounds > 0, "expected the star path")
    assert(ConnectedComponents.lastPropRounds == 2,
      "the lowered cap must bound the propagation rounds exactly")
    assert(got == (0L to 5L).map(_ -> 0L).toMap)
  }

  test("starFirst produces identical labels to the propagation path") {
    val s = spark
    import s.implicits._
    // chain (high diameter) + dense pair + singleton — every regime
    val nodes = (0L to 9L) ++ Seq(20L, 21L, 30L)
    val edges = Seq((9L, 8L), (8L, 7L), (7L, 6L), (6L, 5L), (5L, 4L),
      (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L), (20L, 21L))
    def run(sf: Boolean) = ConnectedComponents.components(
      nodes.toDF("id"), edges.toDF("a", "b"), "id", "a", "b",
      starFirst = sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = run(true)
    assert(viaStar == run(false))
    assert(viaStar(9L) == 0L && viaStar(21L) == 20L && viaStar(30L) == 30L)
  }

  test("arm-in-the-id fusion decodes to bit-identical per-arm labels — " +
    "the q299 single-closure contract") {
    val s = spark
    import s.implicits._
    // arm 0: the full graph; arm 1: the same graph minus a "hub" (node 2),
    // which splits the chain — the exact q299 before/after shape
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 10L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val nodes1 = nodes.filterNot(_ == 2L)
    val edges1 = edges.filterNot { case (a, b) => a == 2L || b == 2L }
    def run(ns: Seq[Long], es: Seq[(Long, Long)]) =
      ConnectedComponents.components(
        ns.toDF("id"), es.toDF("a", "b"), "id", "a", "b", starFirst = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perArm0 = run(nodes, edges)
    val perArm1 = run(nodes1, edges1)
    val fused = run(
      nodes.map(_ * 2L) ++ nodes1.map(_ * 2L + 1L),
      edges.map { case (a, b) => (a * 2L, b * 2L) } ++
        edges1.map { case (a, b) => (a * 2L + 1L, b * 2L + 1L) })
    val decoded0 = fused.collect { case (id, c) if id % 2 == 0 =>
      id / 2 -> c / 2 }
    val decoded1 = fused.collect { case (id, c) if id % 2 == 1 =>
      id / 2 -> c / 2 }
    assert(decoded0 == perArm0, "arm 0 labels diverged under fusion")
    assert(decoded1 == perArm1, "arm 1 labels diverged under fusion")
    // the hub split is real: arm 1 has components {0,1}, {3,4}, {10}
    assert(perArm1(4L) == 3L && perArm1(1L) == 0L && perArm1(10L) == 10L)
  }

  test("job floor holds: the observe-fold keeps one driver action per " +
    "round (measured 35 jobs on the two-path fixture, +2 slack)") {
    // pins ANALYSIS_r13_ccfloor's win structurally: a separate
    // convergence count() reappearing adds ~1 job per round (this
    // fixture runs ~5 rounds → would read ≥ 40). AQE query-stage jobs
    // are part of the measured floor; the pin is for THIS Spark version
    // (re-measure on upgrade, like the PlanGate pins).
    import org.apache.spark.scheduler._
    import org.apache.spark.sql.functions.{col, lit}
    import java.util.concurrent.atomic.AtomicInteger
    val nodes = spark.range(0, 12).toDF("id")
    val edges = spark.range(0, 5)
      .select(col("id").as("a"), (col("id") + lit(1L)).as("b"))
      .unionAll(spark.range(6, 11)
        .select(col("id").as("a"), (col("id") + lit(1L)).as("b")))
    // warm run: JIT + codegen compilation jobs are not part of the floor
    ConnectedComponents.components(nodes, edges, "id", "a", "b").unpersist()
    val jobs = new AtomicInteger
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val c = ConnectedComponents.components(nodes, edges, "id", "a", "b")
    // components() is eager — every round's jobs have been submitted by
    // now; wait for the async listener bus to drain before reading
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(l)
    c.unpersist()
    assert(jobs.get <= 35 + 2,
      s"CC round floor regressed: ${jobs.get} jobs > measured 35+2 — " +
        "did a per-round action (convergence count?) come back?")
  }

  test("non-convergence within maxIter fails loudly instead of truncating") {
    // the failure path must also release its iteration caches: nothing
    // caller-visible references them after the throw
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val e = intercept[IllegalArgumentException] {
      comp(0L to 5L, Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L)),
        maxIter = 2)
    }
    assert(e.getMessage.contains("converge"))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty, s"non-convergence leaked cached RDDs: $leaked")
  }
}
