package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Cross-operator consistency properties for the round-10 additions —
  * invariants the DuckDB oracle cannot express (it checks each query
  * against its own SQL twin; these check queries against EACH OTHER and
  * against closed-form guarantees). */
class RoundTenPropertySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q211: every candidate pair is cross-document and respects the " +
    "shared-band similarity floor") {
    // a candidate pair exists ONLY because some band's 4 consecutive
    // minhashes agreed — so est_sim (the fraction of all 16 agreeing)
    // has a provable floor of 4/16 = 0.25 for every emitted pair, and
    // the join predicate guarantees doc_a < doc_b (no intra-doc pairs,
    // no mirrored duplicates). This corpus has zero exact-dup documents
    // (checked via fingerprints at sf0.001/0.01), so the exact-recall
    // face of the same guarantee — identical paragraphs band together in
    // EVERY band — has no fixture here; the floor is its observable
    // shadow on near-dup data.
    val para = q("q211_para_near_dup")
    assert(para.count() > 0)
    val bad = para.filter(col("doc_a") >= col("doc_b") ||
      col("est_sim") < 0.25 || col("est_sim") > 1.0)
    assert(bad.count() === 0, bad.collect().take(5).mkString(", "))
  }

  test("q216: folds are exactly balanced within every stratum") {
    val sizes = q("q216_exact_kfold")
      .groupBy("source", "fold").agg(count(lit(1)).as("n"))
      .groupBy("source").agg(max("n").as("mx"), min("n").as("mn"),
        countDistinct("fold").as("nf"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      assert(r.getAs[Long]("mx") - r.getAs[Long]("mn") <= 1L,
        s"unbalanced folds in ${r.getAs[String]("source")}: $r")
      assert(r.getAs[Long]("nf") <= 5L)
    }
  }

  test("q219: funnel categories partition the corpus and conserve tokens") {
    val f = q("q219_dedup_funnel")
    val bad = f.filter(
      col("n_docs") =!= col("n_exact_dup") + col("n_near_dup") + col("n_kept")
        || col("tokens_kept") > col("tokens_total"))
    assert(bad.count() === 0, bad.collect().mkString(", "))
    val totalDocs = f.agg(sum("n_docs")).head.getLong(0)
    val corpus = graft.Tables.load(spark, sf, "documents").count()
    assert(totalDocs === corpus,
      s"funnel covers $totalDocs docs, corpus has $corpus")
  }

  test("q215: modularity terms sum into [-1e6, 1e6] and cover every node") {
    val m = q("q215_modularity")
    val qSum = m.agg(sum("q_term_e6")).head.getLong(0)
    assert(qSum >= -1000000L && qSum <= 1000000L, s"modularity e6 = $qSum")
    val nodes = m.agg(sum("n_nodes")).head.getLong(0)
    val lp = q("q201_label_prop").count()
    assert(nodes === lp, s"modularity covers $nodes nodes, label-prop $lp")
  }

  test("q220: displacement is consistent with both rank columns") {
    val rows = q("q220_matryoshka_audit").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("displacement") ===
        r.getAs[Long]("rank_p16") - r.getAs[Long]("rank_full"))
      assert(r.getAs[Long]("rank_p16") >= 1L)
    }
    assert(rows.map(_.getAs[Long]("rank_full")).toSeq == (1L to 20L))
  }
}
