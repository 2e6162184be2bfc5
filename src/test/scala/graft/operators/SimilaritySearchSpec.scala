package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** The composed ANN API against its oracle-checked query twins: Brute
  * reproduces q50 exactly; the approximate strategies reach the same
  * recall bars SimilaritySpec pins for q51/q56. */
class SimilaritySearchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def emb: DataFrame =
    Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))

  private def queries: DataFrame = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("v"))

  private def asSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

  test("Brute topK reproduces the q50 brute-force query exactly") {
    val api = SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", k = 10, SimilaritySearch.Brute)
    val q50 = graft.SparkEntry.queries("q50_knn_cosine")(spark, sf)
    // same (q_id, vec_id, rank) triples — rank ties already broken by id
    assert(asSet(api) == asSet(q50))
  }

  test("BandLsh recall >= 0.8 of brute on the fixture corpus") {
    val exact = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.Brute))
    val approx = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.BandLsh()))
    val hits = exact.map(t => (t._1, t._2))
      .intersect(approx.map(t => (t._1, t._2)))
    assert(hits.size.toDouble / exact.size >= 0.8,
      s"recall ${hits.size.toDouble / exact.size}")
  }

  test("PqAdc recall >= 0.8 of brute on the fixture corpus") {
    val exact = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.Brute))
    // shortlist 128 of 500: the ADC scan must rank true neighbors into
    // the top quarter from 4 code lookups alone — a real discrimination
    // bar, not a covers-everything shortlist
    val approx = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.PqAdc()))
    val hits = exact.map(t => (t._1, t._2))
      .intersect(approx.map(t => (t._1, t._2)))
    assert(hits.size.toDouble / exact.size >= 0.8,
      s"recall ${hits.size.toDouble / exact.size}")
  }

  test("PqAdc is deterministic run-to-run (integer ADC, fixed seeds)") {
    val a = SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 5, SimilaritySearch.PqAdc()).collect().toSeq
    val b = SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 5, SimilaritySearch.PqAdc()).collect().toSeq
    assert(a == b)
  }

  test("IvfPq recall >= 0.6 of brute on the fixture corpus") {
    val exact = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.Brute))
    // recall compounds two approximations (probed cells × ADC ranking)
    // on deliberately structureless synthetic vectors — the honest bar
    // is lower than either stage alone; clustered real embeddings are
    // the regime this index exists for
    val approx = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.IvfPq()))
    val hits = exact.map(t => (t._1, t._2))
      .intersect(approx.map(t => (t._1, t._2)))
    assert(hits.size.toDouble / exact.size >= 0.6,
      s"recall ${hits.size.toDouble / exact.size}")
  }

  test("IvfProbe recall >= 0.8 of brute on the fixture corpus") {
    val exact = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.Brute))
    val approx = asSet(SimilaritySearch.topK(emb, queries, "vec_id", "v",
      "q_id", 10, SimilaritySearch.IvfProbe()))
    val hits = exact.map(t => (t._1, t._2))
      .intersect(approx.map(t => (t._1, t._2)))
    assert(hits.size.toDouble / exact.size >= 0.8,
      s"recall ${hits.size.toDouble / exact.size}")
  }
}
