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

  test("q233: attribution conserves exactly 10^6 micro-credits per " +
    "purchase across all channels including direct") {
    val a = q("q233_attribution")
    val credits = a.agg(sum("credit_e6")).head.getLong(0)
    val purchases = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(credits === 1000000L * purchases,
      s"credits $credits != 1e6 * $purchases")
  }

  test("q229: AUC stays on [0, 1e6] and each anchor scores the rest of " +
    "the corpus exactly once") {
    val rows = q("q229_anchor_auc").collect()
    assert(rows.nonEmpty)
    val n = graft.Tables.load(spark, sf, "embeddings").count()
    rows.foreach { r =>
      val auc = r.getAs[Long]("auc_e6")
      assert(auc >= 0L && auc <= 1000000L, s"auc out of range: $r")
      assert(r.getAs[Long]("npos") + r.getAs[Long]("nneg") === n - 1,
        s"anchor does not score corpus minus itself: $r")
    }
  }

  test("q236/q240: KS statistics agree between the drill-down and the " +
    "matrix, and stay on [0, 1e6]") {
    val drill = q("q236_ks_drift").collect()
    assert(drill.length === 1)
    val ks36 = drill.head.getAs[Long]("ks_e6")
    val matrix = q("q240_ks_matrix").collect()
    matrix.foreach { r =>
      val v = r.getAs[Long]("ks_e6")
      assert(v >= 0L && v <= 1000000L, s"ks out of range: $r")
    }
    val cell = matrix.find(r => r.getAs[String]("src_a") == "src0" &&
      r.getAs[String]("src_b") == "src1").get
    assert(cell.getAs[Long]("ks_e6") === ks36,
      s"matrix cell ${cell.getAs[Long]("ks_e6")} != drill-down $ks36")
  }

  test("q237: snake dealing covers the corpus and balances shard token " +
    "sums to within one max-document") {
    val sh = q("q237_balanced_shards").collect()
    assert(sh.length === 8)
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(sh.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val sums = sh.map(_.getAs[Long]("tok_sum"))
    val maxDoc = sh.map(_.getAs[Long]("max_toks")).max
    assert(sums.max - sums.min <= maxDoc,
      s"imbalance ${sums.max - sums.min} > max doc $maxDoc")
  }

  test("q226: containment pairs bound inter by the smaller shingle set " +
    "and at least one direction clears the threshold") {
    val c = q("q226_containment")
    val bad = c.filter(col("inter") > least(col("sz_a"), col("sz_b")) ||
      greatest(col("cont_a"), col("cont_b")) < 0.5 ||
      col("cont_a") > 1.0 || col("cont_b") > 1.0)
    assert(bad.count() === 0, bad.collect().take(5).mkString(", "))
  }

  test("q247: golden records partition the stitched user base") {
    val g = q("q247_golden_record")
    val users = g.agg(sum("n_users")).head.getLong(0)
    val distinctUsers = graft.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(users === distinctUsers,
      s"golden records cover $users users of $distinctUsers")
    assert(g.filter(col("first_seen") > col("last_seen")).count() === 0)
  }

  test("q246: a burst completion needs at least three events") {
    val b = q("q246_burst_census")
    val bad = b.filter(col("n_bursts") >
      greatest(col("n_events") - 2L, lit(0L)))
    assert(bad.count() === 0, bad.collect().take(5).mkString(", "))
  }

  test("q270: banding recall and candidate volume are monotone in the " +
    "band count — the s-curve the sweep exists to show") {
    val rows = q("q270_lsh_tuning").orderBy("bands").collect()
    assert(rows.map(_.getAs[Long]("bands")).toSeq == Seq(2L, 4L, 8L))
    val recalls = rows.map(_.getAs[Long]("recall_e4"))
    val cands = rows.map(_.getAs[Long]("n_cand"))
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2),
      s"recall not monotone: ${recalls.toSeq}")
    assert(cands(0) <= cands(1) && cands(1) <= cands(2),
      s"candidates not monotone: ${cands.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    }
  }

  test("q275: stitching can only merge sessions, never create them") {
    val rows = q("q275_stitched_sessions").collect()
      .map(r => r.getAs[String]("grain") -> r.getAs[Long]("n_sessions"))
      .toMap
    assert(rows("stitched_identity") <= rows("raw_user"),
      s"stitched ${rows("stitched_identity")} > raw ${rows("raw_user")}")
  }

  test("q276: risk sets shrink only through churn, hazards stay on " +
    "[0, 1e6], and total churn equals the user base") {
    val rows = q("q276_hazard_table").orderBy("day").collect()
    val users = graft.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_churned")).sum === users)
    rows.foreach { r =>
      val h = r.getAs[Long]("hazard_e6")
      assert(h >= 0L && h <= 1000000L, s"hazard out of range: $r")
      assert(r.getAs[Long]("n_churned") <= r.getAs[Long]("n_at_risk"))
    }
  }

  test("q277: eta-squared is a variance FRACTION — [0, 1e6] for every " +
    "type") {
    q("q277_weekday_eta2").collect().foreach { r =>
      val e = r.getAs[Long]("eta2_e6")
      assert(e >= 0L && e <= 1000000L, s"eta2 out of range: $r")
    }
  }

  test("q272: ABC classes partition all parts and A carries the most " +
    "revenue") {
    val rows = q("q272_abc_classes").orderBy("abc_class").collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSeq ==
      Seq("A", "B", "C"))
    val revs = rows.map(_.getAs[Long]("class_rev4"))
    assert(revs(0) >= revs(1) && revs(1) >= revs(2),
      s"class revenue not decreasing: ${revs.toSeq}")
    val parts = graft.Tables.load(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum === parts)
  }

  test("q254: Hamilton apportionment conserves the budget exactly") {
    val allocs = q("q254_hamilton_alloc").collect()
      .map(_.getAs[Long]("alloc"))
    assert(allocs.sum === 1000000L, s"sum = ${allocs.sum}")
    assert(allocs.forall(_ >= 0L))
  }

  test("q287: vocabulary growth is monotone and ends at the full corpus") {
    val rows = q("q287_heaps_curve").orderBy("cp_docs").collect()
    assert(rows.length === 10)
    val vocab = rows.map(_.getAs[Long]("cum_vocab"))
    val toks = rows.map(_.getAs[Long]("cum_tokens"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
  }

  test("q288: participation ratio lands on [1, dim] in e4 units") {
    val pr = q("q288_effective_dim").head.getAs[Long]("pr_e4")
    assert(pr >= 10000L && pr <= 640000L, s"pr_e4 = $pr")
  }

  test("q286: alignment is a mean cosine — on [-1e6, 1e6] per label") {
    q("q286_alignment").collect().foreach { r =>
      val a = r.getAs[Long]("align_e6")
      assert(a >= -1000000L && a <= 1000000L, s"alignment out of range: $r")
    }
  }

  test("q282: the revenue bridge balances to the exact cent") {
    val r = q("q282_revenue_bridge").head
    assert(r.getAs[Long]("residual") === 0L)
    assert(r.getAs[Long]("rev2") - r.getAs[Long]("rev1") ===
      r.getAs[Long]("new_rev") - r.getAs[Long]("lost_rev") +
        r.getAs[Long]("volume_effect") + r.getAs[Long]("price_effect"))
  }

  test("q271: the final backlog is exactly the lineitem-less orders") {
    val last = q("q271_open_backlog").orderBy(col("month").desc)
      .head.getAs[Long]("backlog")
    val orders = graft.Tables.load(spark, sf, "orders")
      .select("o_orderkey")
    val withLines = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey")).distinct()
    val orphans = orders.join(withLines, Seq("o_orderkey"), "left_anti")
      .count()
    assert(last === orphans, s"backlog $last != orphan orders $orphans")
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
