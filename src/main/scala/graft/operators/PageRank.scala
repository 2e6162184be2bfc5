package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.intDiv

/** Fixed-iteration PageRank over an edge list, in pure int64 fixed-point.
  *
  * Why integer arithmetic: the classic double-precision formulation
  * accumulates per-node contribution sums whose result depends on addition
  * order — unacceptable for an oracle-checked operator (and for
  * reproducible re-runs of a 100 TB job). Here every quantity is an
  * integer number of "rank units" (total mass T = 10^12): the initial rank
  * is ⌊T/N⌋, each out-edge carries ⌊r/outdeg⌋ units, the damped update is
  * ⌊3T/(20N)⌋ + ⌊17·S/20⌋ (damping 0.85 = 17/20 as exact integer
  * multiply-then-divide). Integer sums are order-independent, so the
  * result is bit-identical on any engine, any partitioning, any scale.
  * Rounding mass (≤ outdeg per node per round) is deliberately dropped —
  * identically on both sides.
  *
  * Scale shape (same discipline as [[ConnectedComponents]]): one keyed
  * join ranks⋈edges plus one groupBy per iteration — O(edges) shuffle per
  * round, never an N×N product, no driver-side state beyond the loop
  * counter. For long iteration counts persist `edges` once up front (the
  * fixed 3-to-5-round analytics use recomputes the scan, which keeps this
  * function stateless — same trade as q83's documented re-scan).
  *
  * Overflow/exactness: T = 10^12, so 17·S ≤ 1.7·10^13 < 2^53 — every
  * [[intDiv]] precondition holds through the whole computation.
  */
object PageRank {

  val TotalMass: Long = 1000000000000L // 10^12 rank units

  /** Ranks after `iters` damped rounds over `edges` (columns `src`, `dst`;
    * parallel edges should be pre-deduplicated by the caller if unwanted).
    * Returns (node BIGINT, rank BIGINT) for every node that appears as a
    * source or destination. */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
    val n = nodes.count() // one tiny action; N is needed as a literal
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))

    val base = ((3L * TotalMass / 20L) / n) // exact: long division of longs
    val r0: Long = TotalMass / n

    var ranks = nodes.withColumn("rank", lit(r0))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst"), intDiv(col("rank"), col("outdeg")).as("c"))
      val sums = contrib.groupBy("dst")
        .agg(sum(col("c").cast("decimal(38,0)")).cast("long").as("s"))
      ranks = nodes
        .join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(base) +
            intDiv(lit(17L) * coalesce(col("s"), lit(0L)), lit(20L)))
            .as("rank"))
    }
    ranks
  }

  /** Convenience: symmetric (both-direction) edge list from a pair column
    * set — turns a bipartite relation into a sink-free graph. */
  def undirected(pairs: DataFrame, a: Column, b: Column): DataFrame = {
    val ab = pairs.select(a.as("src"), b.as("dst"))
    ab.union(pairs.select(b.as("src"), a.as("dst"))).distinct()
  }
}
