package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation — the missing
  * last step of every dedup pipeline: near-dup operators emit PAIRS
  * (q41/q42/q44), but retention decisions need CLUSTERS (keep one canonical
  * doc per component; similarity is not transitive, so A~B, B~C clusters
  * {A,B,C} even when A~C fails the threshold).
  *
  * Algorithm: every node starts as its own label (its id); each round,
  * every node takes the min label among itself and its neighbors; stop when
  * no label changes. Rounds needed = graph diameter, which for dup clusters
  * is tiny (they are dense near-cliques); each round is one keyed
  * equi-join (edges ⋈ labels on node id) + one min-aggregation — both
  * shuffle-partitioned on node id, nothing driver-side except the
  * converged? count. This is the standard industrial shape (GraphFrames'
  * default CC is the same loop); for adversarial high-diameter graphs the
  * literature's large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") reduces rounds to O(log n) with
  * the same per-round join/agg primitives.
  *
  * The iteration runs ONLY over edge endpoints. In a dedup workload the
  * pair graph touches a small fraction of the corpus (most documents are
  * unique), so the per-round shuffles are O(edges), not O(corpus) — at
  * 100 TB the difference between propagating a few hundred million
  * endpoint labels and re-shuffling every document id fifty times.
  * Singletons are stitched back with one final outer join.
  *
  * Iteration hygiene at scale: each round's labels are persisted and the
  * previous round's are unpersisted, so lineage does not grow with the
  * iteration count (re-execution of round k reads round k-1's cached
  * labels, not the whole chain).
  */
object ConnectedComponents {

  /** `edges`: two integral id columns (undirected; either orientation).
    * `nodes`: one id column — declares the vertex set, so isolated nodes
    * come back as their own singleton components; edge endpoints absent
    * from `nodes` join the vertex set implicitly.
    * Returns (id, component) with component = min node id reachable, one
    * row per distinct id. The result is persisted (MEMORY_AND_DISK) and
    * already materialized — the iteration's intermediate caches are
    * released before returning — so `.unpersist()` on the returned
    * DataFrame releases everything once the caller is done. */
  def components(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    // persist the symmetric edge set: it seeds the labels and is read once
    // per round, and its lineage may be an arbitrarily expensive upstream
    // pipeline (q67's is the whole shingle→jaccard candidate chain —
    // recomputing it per round cost 4×)
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize NOW: the seed below and round 1 both read sym, and two
    // reads racing inside one first job can each recompute the (expensive)
    // edge lineage before the cache is fully populated
    sym.count()
    var cached = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"), col("id").as("prev"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached.select("id", "comp")
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // neighbor labels flow along edges; min over {self} ∪ neighbors.
      // The self rows are tagged so the round's OLD label rides through the
      // same aggregation as `prev` — change detection costs no extra
      // join/shuffle, just a filter over the (cached) round output.
      val msgs = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"), lit(false).as("self"))
      val next = labels.withColumn("self", lit(true)).unionByName(msgs)
        .groupBy("id")
        .agg(min("comp").as("comp"),
          min(when(col("self"), col("comp"))).as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // null prev would mean a vertex with no self row — impossible now
      // that labels seed from the endpoint set itself, but kept as a
      // change signal so a future seeding change cannot fake convergence
      changed = next
        .filter(col("prev").isNull || col("comp") =!= col("prev")).count()
      cached.unpersist()
      cached = next
      labels = next.select("id", "comp")
      iter += 1
    }
    sym.unpersist()
    // release the final round's cache BEFORE the convergence check throws:
    // on the non-convergence path nothing caller-visible references it, so
    // leaving it persisted would leak executor memory for the JVM's life
    if (changed != 0) cached.unpersist()
    require(changed == 0,
      s"connected components did not converge in $maxIter rounds")
    // Singletons (declared nodes with no edges) never entered the loop: a
    // full-outer join stitches them back as their own components while
    // keeping undeclared endpoints from the label side; distinct() keeps
    // the one-row-per-id contract if `nodes` carries duplicates. The
    // result is persisted and MATERIALIZED here so the final round's
    // intermediate cache can be released — otherwise it would leak with no
    // caller-visible handle (unpersist on a derived plan is a no-op).
    val result = nodes.select(col(idCol).as("id")).distinct()
      .join(labels, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    cached.unpersist()
    result
  }
}
