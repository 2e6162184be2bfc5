package graft

import org.apache.spark.sql.functions._

/** LSH ANN (q51) vs brute force (q50): candidates the LSH path returns must
  * score identically to the exact path, and the bucketing must surface
  * neighbors at all. */
class SimilaritySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q51 LSH results agree with q50 exact cosines on shared pairs") {
    val exact = SparkEntry.queries("q50_knn_cosine")(spark, sf)
      .select(col("q_id"), col("vec_id"), col("cos").as("cos_exact"))
    val ann = SparkEntry.queries("q51_knn_lsh")(spark, sf)
    assert(ann.count() > 0, "LSH returned no candidates")
    val joined = ann.join(exact, Seq("q_id", "vec_id"))
    val mismatched = joined.filter(col("cos") =!= col("cos_exact")).count()
    assert(mismatched == 0)
  }

  test("q51 is deterministic across invocations") {
    val a = SparkEntry.queries("q51_knn_lsh")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q51_knn_lsh")(spark, sf).collect().toSeq
    assert(a == b)
  }
}
