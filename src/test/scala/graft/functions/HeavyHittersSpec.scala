package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Misra-Gries candidate sketch: the survival guarantee (freq > N/(k+1)
  * always survives), bounded state under an adversarial long tail, and
  * end-to-end agreement of the two-pass exact refinement with a plain
  * groupBy. */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def candidates(items: Seq[String], k: Int): Set[String] = {
    val mg = udaf(new HeavyHitters(k), ExpressionEncoder[String]())
    items.toDF("tok").repartition(8)
      .agg(mg(col("tok")).as("c"))
      .select(explode(col("c")).as("tok"))
      .as[String].collect().toSet
  }

  test("items above N/(k+1) always survive the sketch") {
    // 3 hot items at 20% each, tail of 4000 singletons: N=10000, k=15
    // ⇒ guarantee threshold N/16 = 625 ≪ 2000
    val hot = Seq("alpha", "beta", "gamma").flatMap(w => Seq.fill(2000)(w))
    val tail = (0 until 4000).map(i => s"tail$i")
    val got = candidates(scala.util.Random.shuffle(hot ++ tail), 15)
    assert(Set("alpha", "beta", "gamma").subsetOf(got),
      s"hot items missing from ${got.size} candidates")
    assert(got.size <= 15, s"sketch exceeded its k=15 bound: ${got.size}")
  }

  test("candidate set is a superset, refinement makes it exact") {
    // threshold n/64 with k=128 candidates (the q83 configuration):
    // refinement must equal the plain groupBy answer exactly
    val words = (0 until 5000).map { i =>
      if (i % 3 == 0) "the" else if (i % 7 == 0) "of" else s"w${i % 1200}"
    }
    val df = words.toDF("tok").repartition(8)
    val total = df.count()
    val mg = udaf(new HeavyHitters(128), ExpressionEncoder[String]())
    val cands = df.agg(mg(col("tok")).as("c"))
      .select(explode(col("c")).as("tok"))
    val refined = df.join(broadcast(cands), "tok")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(total) / 64.0)
      .select("tok", "n").as[(String, Long)].collect().toSet
    val exact = df.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") > lit(total) / 64.0)
      .select("tok", "n").as[(String, Long)].collect().toSet
    assert(exact.nonEmpty && refined == exact)
  }

  test("merge truncates to k and keeps counts conservative") {
    val agg = new HeavyHitters(2)
    val merged = agg.merge(
      Map("a" -> 10L, "b" -> 4L), Map("b" -> 3L, "c" -> 5L))
    // (k+1)-th largest of {a:10, b:7, c:5} is 5 — subtract and drop ≤0
    assert(merged == Map("a" -> 5L, "b" -> 2L))
    assert(agg.reduce(Map("x" -> 1L, "y" -> 2L), "z") == Map("y" -> 1L))
  }
}
