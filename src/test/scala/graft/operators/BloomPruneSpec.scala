package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** BloomPrune.join must be indistinguishable from the plain join (the bloom
  * is superset-only), while provably pruning most non-matching fact rows
  * before the exchange. */
class BloomPruneSpec extends SparkSuite {
  import spark.implicits._

  test("pruned join equals the plain join exactly") {
    val fact = (0L until 1000L).map(i => (i % 500, i)).toDF("k", "payload")
    val dim = Seq((3L, "a"), (7L, "b"), (7L, "c"), (499L, "d"), (1000L, "e"))
      .toDF("dk", "attr")
    val pruned = BloomPrune.join(fact, dim, "k", "dk", expectedItems = 10L)
      .select("k", "payload", "dk", "attr")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "dk", "attr")
    // k=3,499: 2 fact copies each; k=7: 2 fact copies x 2 dim rows
    assert(pruned.count() == 8)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("filter prunes the fact side before the join (few false positives)") {
    val fact = (0L until 10000L).toDF("k")
    val dim = (0L until 10L).toDF("dk")
    val bloom = BloomPrune.bloomOf(dim, "dk", expectedItems = 10L)
    val kept = fact.filter(BloomPrune.mightContain(bloom, col("k"))).count()
    // 10 true hits; fpp at this sizing is ~3% → allow up to 10%
    assert(kept >= 10 && kept <= 1000, s"kept $kept of 10000")
  }

  test("empty dimension yields an always-false filter and an empty join") {
    val fact = (0L until 100L).toDF("k")
    val dim = Seq.empty[Long].toDF("dk")
    val bloom = BloomPrune.bloomOf(dim, "dk", expectedItems = 10L)
    assert(fact.filter(BloomPrune.mightContain(bloom, col("k"))).count() == 0)
    assert(BloomPrune.join(fact, dim, "k", "dk", 10L).count() == 0)
  }

  test("null fact keys survive the filter only if dropped by the join") {
    val fact = Seq(Some(1L), None, Some(2L), None).toDF("k")
    val dim = Seq(1L).toDF("dk")
    val joined = BloomPrune.join(fact, dim, "k", "dk", 10L)
    assert(joined.count() == 1)
    assert(joined.select("k").as[Long].head() == 1L)
  }

  test("plan: might_contain filter sits on the fact scan, ahead of the join") {
    // parquet-backed fact: a LocalTableScan would let Catalyst evaluate the
    // literal-bloom filter at optimization time and erase it from the plan
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    (0L until 100L).toDF("k").write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq(1L, 2L).toDF("dk")
    val plan = BloomPrune.join(fact, dim, "k", "dk", 10L)
      .queryExecution.executedPlan.toString
    val filterAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("Join")
    assert(filterAt >= 0, s"no bloom filter in plan:\n$plan")
    assert(joinAt >= 0 && filterAt > joinAt, // child nodes print BELOW parents
      s"bloom filter not under the join:\n$plan")
  }
}
