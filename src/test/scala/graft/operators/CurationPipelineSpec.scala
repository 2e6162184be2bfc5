package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** The composed curation pipeline against its stage invariants on real
  * testdata — each stage is oracle-checked individually elsewhere; this
  * pins that the COMPOSITION preserves their guarantees. */
class CurationPipelineSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val result = CurationPipeline.run(
    Tables.load(spark, sf, "documents"),
    "doc_id", "text", "lang")

  test("attrition report is monotone and starts at the corpus size") {
    val rows = result.report.orderBy("stage").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq ==
      Seq("1_input", "2_quality", "3_exact_dedup", "4_near_dedup"))
    assert(rows.head._2 == 500)
    assert(rows.map(_._2).sliding(2).forall(p => p(0) >= p(1)),
      s"stage counts increased: ${rows.toSeq}")
  }

  test("kept docs carry no exact-duplicate fingerprints") {
    import graft.functions.TextAnalysis.fingerprint
    val dups = result.kept
      .select(fingerprint(col("text")).as("fp"))
      .groupBy("fp").count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("no near-dup pair above threshold survives among kept docs") {
    val pairs = DedupPipeline.nearDupPairs(
      result.kept, "doc_id", "text", n = 5, minJaccard = 0.5)
    assert(pairs.count() == 0)
  }

  test("every kept doc has a split and a pack honoring the token budget") {
    val kept = result.kept.cache()
    try {
      assert(kept.filter(
        !col("split").isin("train", "val", "test")).count() == 0)
      // greedy first-fit: a pack exceeds the budget only when a single
      // oversized doc owns it alone
      val bad = kept.groupBy("split", "pack_id")
        .agg(sum("n_tokens").as("w"), count(lit(1)).as("n"))
        .filter(col("w") > 256 && col("n") > 1)
        .count()
      assert(bad == 0)
      // deterministic split: ~80/10/10 within loose bounds
      val frac = kept.filter(col("split") === "train").count().toDouble /
        kept.count()
      assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    } finally { kept.unpersist(); () }
  }
}
