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
}
