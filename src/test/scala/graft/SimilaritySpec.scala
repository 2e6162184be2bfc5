package graft

import org.apache.spark.sql.functions._

/** ANN paths (q51 LSH, q56 IVF) vs brute force (q50): candidates the
  * approximate paths return must score identically to the exact path, and
  * each path must clear a quantitative recall bar — not just "returns
  * something". */
class SimilaritySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Mean recall@10 of `ann` against the exact q50 top-10, per query id. */
  private def recallAt10(annName: String): Double = {
    val exact = SparkEntry.queries("q50_knn_cosine")(spark, sf)
      .select(col("q_id"), col("vec_id"))
    val ann = SparkEntry.queries(annName)(spark, sf)
      .select(col("q_id"), col("vec_id"))
    val hits = ann.join(exact, Seq("q_id", "vec_id")).count().toDouble
    val denom = exact.count().toDouble
    assert(denom > 0)
    hits / denom
  }

  test("q51 LSH results agree with q50 exact cosines on shared pairs") {
    val exact = SparkEntry.queries("q50_knn_cosine")(spark, sf)
      .select(col("q_id"), col("vec_id"), col("cos").as("cos_exact"))
    val ann = SparkEntry.queries("q51_knn_lsh")(spark, sf)
    assert(ann.count() > 0, "LSH returned no candidates")
    val joined = ann.join(exact, Seq("q_id", "vec_id"))
    val mismatched = joined.filter(col("cos") =!= col("cos_exact")).count()
    assert(mismatched == 0)
  }

  test("q51 LSH recall@10 >= 0.8 vs exact") {
    val r = recallAt10("q51_knn_lsh")
    assert(r >= 0.8, s"q51 recall@10 = $r")
  }

  test("q56 IVF recall@10 >= 0.8 vs exact") {
    val r = recallAt10("q56_knn_ivf")
    assert(r >= 0.8, s"q56 recall@10 = $r")
  }

  test("q51 is deterministic across invocations") {
    val a = SparkEntry.queries("q51_knn_lsh")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q51_knn_lsh")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("q378 ANN label-noise arm: bounded neighborhoods, rule-consistent " +
    "suspects, and substantial agreement with the brute q306 verdict on " +
    "full neighborhoods") {
    val ann = SparkEntry.queries("q378_label_noise_ann")(spark, sf)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_cand5"), r.getAs[Long]("n_same5"),
          r.getAs[Long]("is_suspect"))).toMap
    assert(ann.nonEmpty, "ANN arm surfaced no neighborhoods — vacuous")
    ann.foreach { case (id, (cand, same, sus)) =>
      assert(cand >= 1L && cand <= 5L, s"vec $id n_cand5=$cand")
      assert(same >= 0L && same <= cand, s"vec $id n_same5=$same")
      assert(sus == (if (2L * same <= cand) 1L else 0L),
        s"vec $id suspect flag violates the majority-loss rule")
    }
    // on FULL 5-candidate neighborhoods the two arms vote over
    // different neighbor sets (LSH top-5 vs exact top-5), so exact
    // agreement is not owed — but the verdicts must correlate strongly,
    // or the candidate generator isn't surfacing real neighborhoods
    val brute = SparkEntry.queries("q306_label_noise")(spark, sf)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("is_suspect")).toMap
    val full = ann.collect { case (id, (5L, _, sus))
      if brute.contains(id) => (sus, brute(id)) }
    assert(full.nonEmpty, "no full neighborhoods to compare — vacuous")
    val agree = full.count { case (a, b) => a == b }.toDouble / full.size
    assert(agree >= 0.8,
      s"ANN vs brute suspect agreement $agree < 0.8 on " +
        s"${full.size} full neighborhoods")
  }

  test("q378's label join is stats-decided, never hint-forced (r17 " +
    "verdict item 1): zero join hints in the scale path; q306 keeps " +
    "exactly its one adjudicated brute-arm hint") {
    // the fix was the ABSENCE of a force: at audit scale stats still
    // pick a broadcast (plan diff empty by design), so the pin that a
    // data-scale (vec_id,label) relation can never again be shipped to
    // every executor is the hint count itself, not the plan shape
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    def hints(name: String): Seq[JoinHint] =
      SparkEntry.queries(name)(spark, sf)
        .queryExecution.optimizedPlan.collect {
          case j: Join if j.hint != JoinHint.NONE => j.hint
        }
    assert(hints("q378_label_noise_ann").isEmpty,
      "q378 (the designated ANN scale path) must carry NO join-strategy " +
        "hints — a forced broadcast of the O(N) label relation is the " +
        "16-GB-at-10^9-vectors regression this pin exists to stop")
    assert(hints("q306_label_noise").size == 1,
      "q306 must keep exactly one hint: the adjudicated brute-arm " +
        "query broadcast (the audit shape) — its label join must stay " +
        "unhinted like q378's")
  }

  test("q378's label join demotes itself when stats say the build side " +
    "is too big: threshold off => no broadcast joins anywhere in the " +
    "scale path's plan") {
    // the at-scale behavior, demonstrated rather than argued: with no
    // hints in the plan, the broadcast decision belongs to the
    // planner's size estimate — force the estimate verdict to "too
    // big" and every broadcast join in q378 must demote to a shuffle
    // strategy with no code change (exactly what happens at 10^9
    // vectors when the label relation outgrows the threshold)
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(conf)
    def bhj(): Long = graft.operators.PlanAudit
      .of(SparkEntry.queries("q378_label_noise_ann")(spark, sf))
      .broadcasts
    val withDefault = bhj()
    spark.conf.set(conf, "-1")
    try assert(bhj() == 0L,
      "with the broadcast threshold disabled q378 must plan zero " +
        "broadcast joins — a surviving one means a hint crept back in")
    finally spark.conf.set(conf, old)
    assert(withDefault >= 1L,
      "at audit scale the stats-decided plan should still broadcast " +
        "the small label relation (the cheap plan) — if this stops " +
        "holding, re-read the join's size estimates")
  }

  test("q384 cross-modal audit separates by perturbation strength: " +
    "weakly-perturbed pairs align (rank 1 both ways), strongly-" +
    "perturbed ones provably drift (rank >= 2)") {
    // the image vector is w(d) = 3 v(d) + b_d v(next), b_d = 1 + d%7:
    // for b <= 2 the own-pair cosine 3/sqrt(9+b^2) dominates the
    // neighbor's b/sqrt(9+b^2) by >= 1/sqrt(13) — far above the
    // uncorrelated-vector noise floor — so the pair must align; for
    // b >= 4 the neighbor provably outranks the pair by the same
    // margin, so rank must be >= 2. A constant-rank table would mean
    // the audit stopped measuring (the all-ranks-1 first cut).
    val rows = graft.SparkEntry
      .queries("q384_crossmodal_retrieval")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (id, t2i, i2t) =>
      val b = id % 7 + 1
      if (b <= 2)
        assert(t2i == 1L && i2t == 1L,
          s"weakly-perturbed pair $id (b=$b) must rank 1, " +
            s"got t2i=$t2i i2t=$i2t")
      if (b >= 4)
        assert(t2i >= 2L && i2t >= 2L,
          s"strongly-perturbed pair $id (b=$b) must drift past its " +
            s"neighbor, got t2i=$t2i i2t=$i2t")
    }
    assert(rows.map(_._2).distinct.length > 1,
      "rank_t2i is constant — the audit separates nothing")
  }
}
