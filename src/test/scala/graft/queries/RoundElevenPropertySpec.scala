package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Cross-operator consistency properties for the round-11 additions —
  * invariants the DuckDB oracle cannot express (it checks each query
  * against its own SQL twin; these check queries against EACH OTHER and
  * against closed-form guarantees). */
class RoundElevenPropertySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q294 KM curve is monotone non-increasing from 10^12 and rides " +
    "exactly on q276's life table") {
    val km = q("q294_km_curve")
    val rows = km.orderBy("day").collect()
    assert(rows.nonEmpty)
    var prev = 1000000000000L
    rows.foreach { r =>
      val v = r.getAs[Long]("km_e12")
      assert(v <= prev && v >= 0L, s"KM not monotone at ${r.getString(0)}")
      prev = v
      assert(r.getAs[Boolean]("log_ok"),
        s"log-space path disagrees at ${r.getString(0)}")
    }
    // the (day, n_at_risk, n_churned) grid must be IDENTICAL to q276's —
    // the curve is a pure function of the hazard table
    val a = km.select("day", "n_at_risk", "n_churned")
    val b = q("q276_hazard_table").select("day", "n_at_risk", "n_churned")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q297 waterfill conserves the budget exactly and caps at n_tokens") {
    val w = q("q297_waterfill_budget").collect()
    assert(w.nonEmpty)
    val total = w.map(_.getAs[Long]("n_tokens")).sum
    val alloc = w.map(_.getAs[Long]("alloc_tokens")).sum
    assert(alloc == total / 2, s"sum(alloc)=$alloc, budget=${total / 2}")
    w.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val a = r.getAs[Long]("alloc_tokens")
      val lvl = r.getAs[Long]("level")
      assert(a <= n, s"over-allocated: $r")
      if (r.getAs[Long]("saturated") == 1L) assert(a == n, s"saturated≠full: $r")
      else assert(a == lvl || a == lvl + 1, s"non-saturated off level: $r")
    }
  }

  test("q299 arms satisfy node/edge/component arithmetic") {
    val byArm = q("q299_hub_robustness").collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    val full = byArm("full"); val de = byArm("dehubbed")
    assert(de.getAs[Long]("n_nodes") == full.getAs[Long]("n_nodes") - 10L)
    assert(de.getAs[Long]("n_edges") <= full.getAs[Long]("n_edges"))
    Seq(full, de).foreach { r =>
      assert(r.getAs[Long]("largest_size") <= r.getAs[Long]("n_nodes"))
      assert(r.getAs[Long]("n_components") >= 1L)
      assert(r.getAs[Long]("largest_share_e4") <= 10000L)
    }
  }

  test("q303 runs-test counts are internally consistent") {
    q("q303_runs_test").collect().foreach { r =>
      val n = r.getAs[Long]("n_moves")
      assert(r.getAs[Long]("n_up") + r.getAs[Long]("n_down") == n, s"$r")
      val runs = r.getAs[Long]("n_runs")
      assert(runs >= 1L && runs <= n, s"$r")
    }
  }

  test("q302 TVD is a bounded half-matrix over all source pairs") {
    val t = q("q302_source_tvd")
    val ns = graft.Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(t.count() == ns * (ns - 1) / 2)
    val bad = t.filter(col("tvd_e6") < 0L || col("tvd_e6") > 1000000L ||
      col("src_a") >= col("src_b"))
    assert(bad.count() == 0, bad.collect().take(5).mkString(", "))
  }

  test("q311 CV folds conserve each user's pair count") {
    // n_train + n_test must equal the user's total (lead-pair) rows for
    // every fold row — the complement-sums construction, checked against
    // an independent recount
    val cv = q("q311_cv_ols")
    val totals = graft.Tables.load(spark, sf, "events")
      .groupBy("user_id").agg((count(lit(1)) - 1L).as("n_pairs"))
    val bad = cv.join(totals, "user_id")
      .filter(col("n_train") + col("n_test") =!= col("n_pairs"))
    assert(bad.count() == 0, bad.collect().take(5).mkString(", "))
    val folds = cv.select("fold").distinct().collect().map(_.getLong(0))
    assert(folds.forall(f => f >= 0 && f <= 4))
  }

  test("q308 emits exactly 10 paths in non-increasing count order") {
    val p = q("q308_path_trigrams").orderBy("rnk").collect()
    assert(p.length == 10)
    assert(p.map(_.getAs[Long]("n")).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("q306 label votes are bounded and cover every nonzero vector") {
    val l = q("q306_label_noise")
    val nonZero = graft.Tables.load(spark, sf, "embeddings")
      .filter(expr("aggregate(transform(embedding, x -> cast(x as double)" +
        " * x), 0D, (a, x) -> a + x)") > 0.0)
      .count()
    assert(l.count() == nonZero)
    val bad = l.filter(col("n_same5") < 0L || col("n_same5") > 5L ||
      (col("is_suspect") === 1L) =!= (col("n_same5") <= 2L))
    assert(bad.count() == 0)
  }

  test("q312 contribution shares close to the net within truncation slack") {
    val m = q("q312_top_movers").collect()
    val net = m.map(_.getAs[Long]("delta_4")).sum
    val rec = m.map(r => r.getAs[Long]("rev97_4") - r.getAs[Long]("rev96_4")).sum
    assert(net == rec, "delta decomposition incomplete")
    val shares = m.flatMap(r => Option(r.getAs[java.lang.Long]("contrib_e4")))
      .map(_.toLong)
    // each share truncates toward zero, so the sum undershoots 10^4 by
    // at most one unit per nation
    if (net != 0 && shares.nonEmpty)
      assert(math.abs(shares.sum - 10000L) <= m.length.toLong,
        s"shares sum to ${shares.sum}")
  }

  test("q305 calibration bins are valid deciles with bounded rates") {
    val c = q("q305_cos_calibration")
    val bad = c.filter(col("bin") < 0L || col("bin") > 9L ||
      col("n_same") > col("n_pairs") || col("same_rate_e4") > 10000L)
    assert(bad.count() == 0)
    assert(c.count() > 0)
  }

  test("q310 JL audit: distances non-negative, full sample half-matrix") {
    val j = q("q310_jl_audit")
    assert(j.count() == 100L * 99L / 2L)
    val bad = j.filter(col("d2_orig_e6") < 0L || col("d2_proj_e6") < 0L)
    assert(bad.count() == 0)
  }

  test("deflate ratios are sane and low on this low-entropy corpus") {
    val r = CurationQueries.deflateRatios(spark, sf)
    assert(r.count() ==
      graft.Tables.load(spark, sf, "documents").count())
    // word-soup documents drawn from a tiny vocabulary MUST compress
    // well below 1:1 once past deflate's fixed header/dictionary
    // overhead (sub-100-byte docs legitimately sit at or slightly above
    // 1:1 — that overhead regime is itself part of the signal); broken
    // plumbing would show as non-positive or wildly inflated ratios
    val bad = r.filter(col("ratio_e4") <= 0L || col("ratio_e4") > 13000L ||
      col("orig_bytes") <= 0L ||
      (col("orig_bytes") >= 200L && col("ratio_e4") >= 10000L))
    assert(bad.count() == 0, bad.collect().take(5).mkString(", "))
  }

  test("q319 oracle core agrees with the deflate arm: byte lengths " +
    "identical, redundancy bounded, ASCII precondition holds") {
    val core = q("q319_compression_ratio")
    val defl = CurationQueries.deflateRatios(spark, sf)
      .select(col("doc_id"), col("orig_bytes").as("defl_bytes"),
        col("ratio_e4"))
    val j = core.join(defl, "doc_id").cache()
    try {
      // orig_bytes is the same UTF-8 count both arms measure; the corpus
      // is ASCII (the oracle's code-point indexing = Spark's UTF-16
      // indexing precondition — octet count equals char count + 7-gram
      // slack check via n_8grams)
      assert(j.filter(col("orig_bytes") =!= col("defl_bytes")).count() == 0)
      assert(j.filter(col("orig_bytes") =!=
        col("n_8grams") + lit(7L)).count() == 0, "non-ASCII doc slipped in")
      // redundancy is a ratio in (0, 1]: distinct ≤ total, and ≥ 1 gram
      // distinct whenever any exists
      val bad = j.filter(col("distinct_8grams") > col("n_8grams") ||
        (col("n_8grams") > 0L && col("distinct_8grams") < 1L) ||
        col("redundancy_e4") > 10000L || col("redundancy_e4") < 1L)
      assert(bad.count() == 0, bad.collect().take(5).mkString(", "))
    } finally j.unpersist()
  }

  test("8-gram redundancy ranks fixture extremes the same way deflate " +
    "does — the proxy claim behind q319's oracle core") {
    val rep = "spark shuffle " * 300
    val varied = (0 until 600).map(i =>
      java.lang.Long.toString(i * 2654435761L % 99991, 36)).mkString(" ")
    def redundancyE4(t: String): Long = {
      val n = t.length - 7
      val d = (0 until n).map(i => t.substring(i, i + 8)).distinct.size
      (d * 20000L + n) / (2L * n)
    }
    val (rRep, rVar) = (redundancyE4(rep), redundancyE4(varied))
    val (dRep, dVar) = (CurationQueries.deflateRatioE4(rep),
      CurationQueries.deflateRatioE4(varied))
    assert(rRep < rVar && dRep < dVar,
      s"rank disagreement: 8gram=($rRep,$rVar) deflate=($dRep,$dVar)")
    assert(rVar > rRep * 5, s"8-gram signal flattened: $rRep vs $rVar")
  }

  test("deflate ratio discriminates repetitive from varied text") {
    // the signal's core claim, pinned on the exact helper the query
    // runs: pure repetition compresses an order of magnitude below
    // high-variety text of the same length
    val rep = CurationQueries.deflateRatioE4("spark shuffle " * 300)
    val varied = CurationQueries.deflateRatioE4(
      (0 until 600).map(i =>
        java.lang.Long.toString(i * 2654435761L % 99991, 36))
        .mkString(" "))
    assert(rep > 0 && varied > rep * 5,
      s"repetitive=$rep varied=$varied — signal inverted or flattened")
    intercept[IllegalArgumentException] {
      CurationQueries.deflateRatioE4("")
    }
  }

  test("q316 direct-evidence shares are consistent with cluster sizes") {
    val t = q("q316_cluster_transitivity")
    val bad = t.filter(col("n_direct") > col("n_possible") ||
      col("n_direct") < col("n_members") - 1 || // spanning needs ≥ n−1 edges
      col("direct_share_e4") > 10000L)
    assert(bad.count() == 0, bad.collect().take(5).mkString(", "))
  }

  test("q313 dwell totals dominate their max and mean") {
    q("q313_state_dwell").collect().foreach { r =>
      assert(r.getAs[Long]("total_us") >= r.getAs[Long]("max_us"), s"$r")
      assert(r.getAs[Long]("mean_us") <= r.getAs[Long]("max_us"), s"$r")
    }
  }

  test("q314 MoM uses 16 buckets and matches the plain mean on clean data") {
    q("q314_median_of_means").collect().foreach { r =>
      assert(r.getAs[Long]("n_buckets") == 16L, s"$r")
      // clean synthetic values: the robust estimate should agree with
      // the mean to within half of it (sf0.001 buckets hold only ~7
      // rows each, so bucket means scatter widely — this is a sanity
      // pin; the exact values are hash-checked by the oracle)
      assert(r.getAs[Long]("abs_gap_e2") <= r.getAs[Long]("mean_e2") / 2,
        s"$r")
    }
  }
}
