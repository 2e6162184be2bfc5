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

  test("q384 cross-modal audit separates by PIXEL-read perturbation " +
    "strength: weakly-perturbed pairs align (rank 1 both ways), " +
    "strongly-perturbed ones provably drift (rank >= 2)") {
    // the image vector is w(d) = 3 v(d) + b_d v(next) + u_d/4, where
    // BOTH error terms are read from the doc's REAL decoded bitmap:
    // b_d = 1 + (sum of pixel bytes) % 7 and u_d is the unit centered
    // block-intensity direction (r19 verdict item 3 — the first cut's
    // b = 1 + d%7 mixed text embeddings only). The theory is
    // DIRECTION-AWARE. i2t (one image vs all texts) is the coupled-
    // numerator argument: own − neighbor numerators differ by
    // (3 − b)(1 − v·vn) + u·(v − vn)/4, and with the fixture's
    // measured ceilings (mc = 0.49, mu = 0.44 at sf0.01) the margin is
    // ≥ |3−b|(1−mc) − mu/2 ≥ 0.29, so b <= 2 forces rank 1 and b >= 4
    // forces the neighbor past the pair. t2i (one text vs all IMAGES)
    // has no such symmetry: the corpus contains every OTHER doc's
    // perturbed image, and the predecessor p = q−1 pulls toward v(q)
    // with strength b_p — a strongly-perturbed predecessor
    // legitimately claims rank 1 (the confusion pattern a real CLIP
    // audit surfaces: a neighbor's image drifted into your region —
    // the old b = 1 + d%7 design never exhibited it because
    // consecutive strengths were consecutive). So for b <= 2 the pair
    // sits at rank <= 2 (only the predecessor can outrank — strangers
    // stay under the noise floor), and for b >= 4 with b_p >= 4 the
    // predecessor's pull b_p/|w_p| >= 0.8 provably tops the own
    // 3/|w_q| <= 0.6, forcing rank >= 2. The test recomputes b from
    // the bitmap fixture's closed form — if the engine's decode chain
    // dropped a byte, b would move and the oracle hash fail first.
    val rows = graft.SparkEntry
      .queries("q384_crossmodal_retrieval")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    def bOf(id: Long): Long = {
      val l = (id % 62 + 2) * (id % 46 + 2) * 3
      var s = 0L; var i = 0L
      while (i < l) { s += (id * 31 + i) % 251; i += 1 }
      1 + s % 7
    }
    val bs = rows.map { case (id, _, _) => bOf(id) }
    assert(bs.exists(_ <= 2) && bs.exists(_ >= 4),
      "anchor draw no longer spans both sides of the b=3 split — " +
        "the separation test would be vacuous")
    rows.foreach { case (id, t2i, i2t) =>
      val b = bOf(id)
      if (b <= 2) {
        assert(i2t == 1L,
          s"weakly-perturbed pair $id (b=$b) must rank 1 in i2t, " +
            s"got $i2t")
        assert(t2i <= 2L,
          s"weakly-perturbed pair $id (b=$b): only the predecessor's " +
            s"drifted image may outrank it in t2i, got rank $t2i")
      }
      if (b >= 4) {
        assert(i2t >= 2L,
          s"strongly-perturbed pair $id (b=$b) must drift past its " +
            s"neighbor in i2t, got $i2t")
        if (id > 0 && bOf(id - 1) >= 4)
          assert(t2i >= 2L,
            s"pair $id (b=$b, pred b=${bOf(id - 1)}): the " +
              s"predecessor's image must outrank it in t2i, got $t2i")
      }
    }
    assert(rows.map(_._2).distinct.length > 1,
      "rank_t2i is constant — the audit separates nothing")
  }
}
