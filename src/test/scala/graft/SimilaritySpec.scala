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
}
