package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The property the round-2 verdict demanded of the IVF coarse quantizer:
  * the centroid set is HARD-BOUNDED by the cap no matter how large the
  * corpus — assignment stays O(N·C) with C fixed. */
class IvfSpec extends SparkSuite {

  private def vectors(n: Int) = {
    val s = spark
    import s.implicits._
    s.range(n.toLong).select(col("id").as("vec_id"),
      array(lit(1.0), lit(2.0)).as("v"))
  }

  test("centroid count is capped regardless of corpus size") {
    val small = Ivf.selectCentroids(vectors(5000), "vec_id", "v", 31, 16)
    val large = Ivf.selectCentroids(vectors(50000), "vec_id", "v", 31, 16)
    assert(small.count() == 16)
    assert(large.count() == 16)
  }

  test("without the cap binding, selection matches the rate filter") {
    val all = Ivf.selectCentroids(vectors(2000), "vec_id", "v", 31, 1000000)
    // expected density ~ n/rate; every selected id passes the hash filter
    val n = all.count()
    assert(n > 0 && n < 2000 / 8, s"rate filter selected $n of 2000")
  }

  test("selection is deterministic and cap keeps the smallest hashes") {
    val a = Ivf.selectCentroids(vectors(20000), "vec_id", "v", 31, 32)
      .select("c_id").collect().map(_.getLong(0)).toSet
    val b = Ivf.selectCentroids(vectors(20000), "vec_id", "v", 31, 32)
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // capped set is a subset of the uncapped rate-filter survivors
    val full = Ivf.selectCentroids(vectors(20000), "vec_id", "v", 31, 1000000)
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(full))
  }
}
