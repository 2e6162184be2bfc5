package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Integer fixed-point PageRank: determinism under repartitioning, hub
  * dominance on a star, symmetry on a regular graph, and the mass
  * accounting the fixed-point arithmetic guarantees. */
class PageRankSpec extends SparkSuite {

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3,
      parts: Int = 1): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    val e = edges.toDF("src", "dst").repartition(parts)
    PageRank.ranks(e, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // undirected star: hub 0 <-> leaves 1..8
  private val star: Seq[(Long, Long)] =
    (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L)))

  test("star graph: the hub outranks every leaf, leaves tie exactly") {
    val got = ranks(star)
    val leaves = (1L to 8L).map(got)
    assert(leaves.distinct.size == 1) // identical integers, not "close"
    assert(got(0L) > leaves.head * 4)
  }

  test("bit-identical results under different input partitionings") {
    // integer contributions sum order-independently: 1 vs 7 partitions
    // must agree on every single rank unit
    assert(ranks(star, parts = 1) == ranks(star, parts = 7))
  }

  test("regular graph (4-cycle): all nodes tie at ~T/N") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (1L, 0L), (2L, 1L), (3L, 2L), (0L, 3L))
    val got = ranks(cyc)
    assert(got.values.toSeq.distinct.size == 1)
    // each rank stays within rounding slack of the uniform share
    val share = PageRank.TotalMass / 4
    assert(math.abs(got(0L) - share) <= 20)
  }

  test("total mass is conserved up to floor-rounding slack") {
    val got = ranks(star)
    val total = got.values.sum
    // every intDiv drops < 1 unit per (node, round) for base and damp
    // plus < outdeg units across contributions: slack ≪ N * iters * 3
    val slack = 9L * 3 * 3 + 100
    assert(total <= PageRank.TotalMass)
    assert(total >= PageRank.TotalMass - slack)
  }

  test("sink nodes (directed edge list) leak mass but stay deterministic") {
    // 0 -> 1, 0 -> 2: nodes 1,2 are sinks with no out-edges
    val got = ranks(Seq((0L, 1L), (0L, 2L)))
    assert(got(1L) == got(2L))
    assert(got.values.sum < PageRank.TotalMass) // leak is expected
  }

  private def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int = 3): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    PageRank.personalizedRanks(edges.toDF("src", "dst"),
        seeds.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("personalized: seed hub dominates, leaves tie, off-component is 0") {
    // star hubbed at the seed plus a far pair the walk can never reach:
    // teleport keeps returning mass to 0, each leaf holds an identical
    // share of one bounce, and 8-9 never see any mass at all
    val g = star ++ Seq((18L, 19L), (19L, 18L))
    val got = ppr(g, Seq(0L), iters = 3)
    val leaves = (1L to 8L).map(got)
    assert(leaves.distinct.size == 1) // identical integers
    assert(got(0L) > leaves.head) // the cohort center outranks neighbors
    assert(got(18L) == 0L && got(19L) == 0L) // unreachable ⇒ exactly zero
  }

  test("personalized: phantom seeds are dropped, in-graph seeds split " +
      "teleport mass; uniform seed set over all nodes ≈ global behavior") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    // phantom node 99 is not in the graph — |S| must be 4, not 5,
    // which on a regular graph reproduces the uniform global ranks
    val got = ppr(cyc, Seq(0L, 1L, 2L, 3L, 99L))
    assert(got.values.toSeq.distinct.size == 1)
    assert(math.abs(got(0L) - PageRank.TotalMass / 4) <= 20)
    assert(!got.contains(99L))
  }

  test("personalized: bit-identical under different input partitionings") {
    val s = spark
    import s.implicits._
    val e = star.toDF("src", "dst")
    val one = PageRank.personalizedRanks(e.repartition(1),
      Seq(1L).toDF("node"), 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val seven = PageRank.personalizedRanks(e.repartition(7),
      Seq(1L).toDF("node"), 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == seven)
  }

  test("undirected() symmetrizes and dedups parallel edges") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val e = PageRank.undirected(pairs, col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }
}
