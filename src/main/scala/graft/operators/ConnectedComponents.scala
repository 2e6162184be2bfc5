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
  * converged? count. This is the standard industrial shape
  * (GraphFrames' default CC is the same loop). Min-label's round count is
  * the graph DIAMETER — tiny for dup clusters (dense near-cliques), but a
  * chained near-dup corpus (crawl mirrors A~B~C~…) can produce long
  * paths; for those the loop auto-falls-back after [[starFallbackAt]]
  * rounds to the literature's alternating large-star/small-star algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * which contracts every component to a star rooted at its min id in
  * O(log n) rounds of the same join/agg primitives — each round rewires
  * every node to its neighborhood min, so distances shrink geometrically
  * instead of by one hop per round.
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

  /** Default min-label rounds before switching to alternating-star: dup
    * clusters converge in 2–4 rounds, so 15 propagation rounds only run in
    * full on a genuinely high-diameter graph — exactly the shape star
    * handles in O(log n). (No fallback when the caller's maxIter is ≤ the
    * cap: a tight explicit budget means "fail loudly", not "try harder".)
    * Callers (tests, mostly) override per-call via the `starFallbackAt`
    * PARAMETER of [[components]] — the round-12 form was a @volatile var,
    * which let any suite mutate CC pacing JVM-wide (ADVICE r12). */
  val StarFallbackDefault = 15

  /** Rounds the last alternating-star run took — test introspection only
    * (the O(log n) convergence claim is asserted, not assumed). */
  @volatile private[graft] var lastStarRounds: Int = -1

  /** Rounds the last min-label propagation phase took — test
    * introspection for the pointer-jumping O(log d) claim. */
  @volatile private[graft] var lastPropRounds: Int = -1

  /** Materialize `df`'s cache AND evaluate one scalar aggregate over its
    * rows in a single job with NO extra exchange: the aggregate rides a
    * [[org.apache.spark.sql.Observation]] metric above the persist and
    * the action is a noop-sink write, so the job's last stage is the
    * cache-building scan itself — where a `.count()`/`.agg().head` adds
    * a single-partition final-reduce stage per call (one scheduler-floor
    * round-trip per CC round; measured in ANALYSIS_r13_ccfloor.md).
    * Returns 0 when the metric is null (empty input). */
  private def materializeCounting(df: DataFrame,
      metric: org.apache.spark.sql.Column): Long = {
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, coalesce(metric, lit(0L)).as("m"))
      .write.mode("overwrite").format("noop").save()
    obs.get("m").asInstanceOf[Long]
  }

  /** Re-anchor a persisted, materialized round result as a logical-plan
    * LEAF (LogicalRDD over its cached blocks). Without this, every round's
    * plan embeds the previous round's plan TWICE (once under the join, once
    * under the union), so the logical tree doubles per round — by round ~15
    * the driver spends unbounded CPU in analysis/canonicalization before a
    * single task runs. Lineage-by-cache is not enough: persist() leaves the
    * logical plan intact and only substitutes InMemoryRelation at planning
    * time, after the exponential tree has already been analyzed. At 100 TB
    * the executors never notice; the DRIVER is the component this protects. */
  private def snap(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** `edges`: two integral id columns (undirected; either orientation).
    * `nodes`: one id column — declares the vertex set, so isolated nodes
    * come back as their own singleton components; edge endpoints absent
    * from `nodes` join the vertex set implicitly.
    * Returns (id, component) with component = min node id reachable, one
    * row per distinct id. The result is persisted (MEMORY_AND_DISK) and
    * already materialized — the iteration's intermediate caches are
    * released before returning — so `.unpersist()` on the returned
    * DataFrame releases everything once the caller is done. */
  /** `starFirst = true` skips the min-label propagation phase and goes
    * straight to alternating-star. Labels are IDENTICAL either way (both
    * converge to min-id components — the choice is pure cost); use it
    * when the caller KNOWS the graph is high-diameter (a giant sparse
    * component, e.g. the q108 co-order graph), where the 15 propagation
    * rounds are guaranteed wasted work before the fallback fires anyway
    * — q299 measured 31.7s → ~11s from exactly this. The default stays
    * propagation-first: dup clusters converge in 2–4 cheap rounds and
    * never pay star's per-round exact fixed-point check. */
  def components(nodes: DataFrame, edges: DataFrame,
      idCol: String, srcCol: String, dstCol: String,
      maxIter: Int = 50, starFirst: Boolean = false,
      starFallbackAt: Int = StarFallbackDefault): DataFrame = {
    // persist the symmetric edge set: it seeds the labels and is read once
    // per round, and its lineage may be an arbitrarily expensive upstream
    // pipeline (q67's is the whole shingle→jaccard candidate chain —
    // recomputing it per round cost 4×).
    // PRE-PARTITIONED on the join key (r20, guide §2.4 — partition once,
    // iterate many): every propagation round joins sym on `src`, and an
    // unpartitioned cache re-shuffled the O(E) edge set EVERY round while
    // the labels side is only O(V). One explicit hash repartition before
    // the persist makes the cached InMemoryRelation carry
    // hashpartitioning(src, n) — each round's join then exchanges only
    // the label table. At 100 TB the edge set is the corpus-scale side;
    // this moves the per-round shuffle from O(E) to O(V).
    val np = math.max(1,
      edges.sparkSession.sessionState.conf.numShufflePartitions)
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .repartition(np, col("src"))
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
    val propCap = if (starFirst) 0 else math.min(maxIter, starFallbackAt)
    // One propagation step per materialization barrier — measured, not
    // assumed (ANALYSIS_r12_q263.md): at small frontier sizes the round
    // cost is per-STAGE scheduler floor, and both attempted accelerations
    // lost or tied on q263's 12-round percolation core — a label-of-label
    // pointer-jump never shortcuts through regional minima (label sinks:
    // 12 rounds stayed 12, join cost added), and chaining two steps per
    // barrier just serializes the same shuffle stages inside one job
    // (5.9–6.3 s either way). The plain loop is the simplest shape with
    // the same measured cost.
    while (changed > 0 && iter < propCap) {
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
      // change signal so a future seeding change cannot fake convergence.
      // The changed-row count rides an observe() metric on the noop write
      // that materializes the cache — NOT a separate .count() action: the
      // count's single-partition final reduce was one extra stage of
      // scheduler floor per round (round-12 verdict item 5; A/B numbers
      // in ANALYSIS_r13_ccfloor.md). The observe node sits ABOVE the
      // persist, so the metric fires off the rows streaming out of the
      // cache-building scan and later cache hits never re-fire it.
      changed = materializeCounting(next,
        sum(when(col("prev").isNull || col("comp") =!= col("prev"), 1L)
          .otherwise(0L)))
      cached.unpersist()
      cached = next
      // snap: next round's plan must reference THIS round as a leaf, not as
      // a subtree, or plan size doubles per round (see [[snap]])
      labels = snap(next).select("id", "comp")
      iter += 1
    }
    lastPropRounds = iter
    if (changed != 0 && maxIter > propCap) {
      // high-diameter graph: min-label is pacing at one hop per round —
      // hand the (still-cached) edge set to alternating-star, which owns
      // its own iteration caches and returns persisted+materialized labels
      val starLabels =
        try alternatingStar(sym, maxIter)
        catch { case e: Throwable =>
          cached.unpersist(); sym.unpersist(); throw e
        }
      cached.unpersist()
      cached = starLabels
      // star labels cover the final star forest's endpoints; any endpoint
      // whose component IS itself may have contracted away, so re-anchor on
      // the full endpoint set (computed from the still-persisted sym)
      labels = sym.select(col("src").as("id")).distinct()
        .join(starLabels.select(col("id"), col("comp")), Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      changed = 0
    }
    // release the iteration caches BEFORE the convergence check throws:
    // on the non-convergence path nothing caller-visible references them, so
    // leaving them persisted would leak executor memory for the JVM's life.
    // (On success sym must stay cached until the result materializes — the
    // star path's labels re-anchor on sym's endpoint set.)
    if (changed != 0) { sym.unpersist(); cached.unpersist() }
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
    sym.unpersist()
    cached.unpersist()
    result
  }

  /** Alternating large-star/small-star (Kiveris et al. 2014): contracts
    * every component to a star rooted at its minimum id in O(log n) rounds.
    * Works on the CANONICAL edge set — (u, v) with u > v, distinct, no
    * self-loops — and returns a persisted, materialized (id, comp) frame
    * over the final forest's endpoints.
    *
    * Large-star: every node u computes m = min(N(u) ∪ {u}) and rewires each
    * LARGER neighbor v > u to m (edge (v, m)). Small-star: every node u
    * computes m = min of its smaller neighbors and rewires them all — plus
    * itself — to m. Both halves emit only (bigger, smaller) pairs, so
    * canonical form is preserved without re-normalizing; both are one
    * groupBy + one join on u, shuffle-partitioned the same way as the
    * min-label loop. Convergence (the edge set is a fixed point) is checked
    * exactly: same cardinality and an empty left-anti — no checksum
    * probabilism in the correctness path. */
  private def alternatingStar(sym: DataFrame, maxRounds: Int): DataFrame = {
    var cache = sym.filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cnt = cache.count()
    var edges = snap(cache) // leaf plan — same round-over-round rule as the
    // min-label loop: each round must reference the last as a leaf
    var converged = cnt == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      import org.apache.spark.sql.expressions.Window
      val both = edges.union(
        edges.select(col("v").as("u"), col("u").as("v")))
      // Each half-round's per-node neighborhood minimum rides an
      // unordered window over the node key instead of a min-aggregate +
      // join-back (r20, guide §2.4 — the same one-exchange df-gate
      // discipline the pair miners use): the window's partition IS the
      // join key, so the "compute m per u, attach m to every (u, v)
      // row" shape costs ONE keyed exchange where groupBy + join paid
      // an aggregate exchange AND re-listed its input under the join.
      // Per round: 5 exchanges + 2 joins → 3 exchanges + 0 joins,
      // identical emitted pairs.
      // large-star: m = min(N(u) ∪ {u}); every LARGER neighbor v > u
      // rewires to (v, m) — m ≤ u < v, so the pair is already canonical
      // and can never be a self-loop. NOT distinct()ed: duplicates (two
      // old neighbors of v sharing one min) change neither min downstream
      // and `next` dedups before the fixed-point test.
      val withMin = both
        .withColumn("m",
          least(min(col("v")).over(Window.partitionBy("u")), col("u")))
      val large = withMin.filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: per (renamed) u, m = min of its (all smaller)
      // neighbors; emit (v, m) for every neighbor plus (u, m) itself —
      // the second arm carries one row per source ROW instead of one
      // per u, which the tail distinct collapses identically.
      // v ≥ m by minimality, v = m is the tautological self-loop.
      val sWithMin = large
        .withColumn("m", min(col("v")).over(Window.partitionBy("u")))
      val next = sWithMin.select(col("v").as("n"), col("m"))
        .union(sWithMin.select(col("u").as("n"), col("m")))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // same observe-on-materialize fold as the min-label loop: the
      // cardinality needed by the fixed-point test rides the noop write
      val nextCnt = materializeCounting(next, count(lit(1)))
      // exact fixed-point test: next ⊆ edges ∧ |next| = |edges| ⟺ equal
      // (both sides are distinct sets)
      converged = nextCnt == cnt &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      cache.unpersist()
      cache = next
      edges = snap(next)
      cnt = nextCnt
      round += 1
    }
    lastStarRounds = round
    if (!converged) cache.unpersist()
    require(converged,
      s"connected components (alternating star) did not converge in " +
        s"$maxRounds rounds")
    // the fixed point is a forest of min-rooted stars: every leaf's sole
    // neighbor is its root, every root's neighbors are all larger
    val labels = edges
      .select(col("u").as("id"), col("v").as("nb"))
      .union(edges.select(col("v").as("id"), col("u").as("nb")))
      .groupBy("id").agg(min("nb").as("mv"))
      .select(col("id"), least(col("mv"), col("id")).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    cache.unpersist()
    labels
  }
}
