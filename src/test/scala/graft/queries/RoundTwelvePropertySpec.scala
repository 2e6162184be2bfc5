package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Cross-operator consistency properties for the round-12 additions —
  * invariants the DuckDB oracle cannot express (it checks each query
  * against its own SQL twin; these check queries against each other and
  * against closed-form guarantees). */
class RoundTwelvePropertySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q321 KMV estimates land within the k=32 sketch's error regime") {
    val r = q("q321_kmv_cardinality").collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getAs[Long]("n_exact")
      val est = row.getAs[Long]("kmv_est")
      assert(est > 0 && row.getAs[Long]("kth_u32") > 0)
      // 1/√(k−2) ≈ 18% standard error; 60% is a loose deterministic
      // bound this fixture clears with margin — a broken estimator
      // (wrong k, wrong scale constant) misses by orders of magnitude
      assert(math.abs(est - exact) * 10 < exact * 6,
        s"KMV off by ${math.abs(est - exact)} on exact=$exact")
    }
  }

  test("q322 PR curve is a valid sweep: recall non-decreasing to 10^6, " +
    "counts cumulative") {
    val rows = q("q322_pr_curve").orderBy(col("score_unit").desc).collect()
    assert(rows.nonEmpty)
    var tp = 0L; var fp = 0L; var lastRec = 0L
    rows.foreach { r =>
      tp += r.getAs[Long]("n_pos"); fp += r.getAs[Long]("n_neg")
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp,
        s"cumulative counts broken at ${r}")
      val rec = r.getAs[Long]("recall_e6")
      assert(rec >= lastRec, "recall decreased while threshold dropped")
      lastRec = rec
      assert(r.getAs[Long]("precision_e6") <= 1000000L)
    }
    assert(lastRec == 1000000L, s"final recall $lastRec != 1e6")
  }

  test("q323/q324 agree on the shared stumps and stay in range") {
    val m = q("q323_mcnemar").collect().head
    val kp = q("q324_cohen_kappa").collect().head
    assert(m.getAs[Long]("n") == kp.getAs[Long]("n"))
    assert(m.getAs[Long]("b") + m.getAs[Long]("c") <= m.getAs[Long]("n"))
    val kappa = kp.getAs[Long]("kappa_e6")
    assert(kappa >= -1000000L && kappa <= 1000000L, s"kappa=$kappa")
    assert(kp.getAs[Long]("p_o_e6") <= 1000000L)
  }

  test("q325 tau is bounded and S respects the pair-count ceiling") {
    q("q325_mann_kendall").collect().foreach { r =>
      val n = r.getAs[Long]("n_days"); val s = r.getAs[Long]("s_stat")
      assert(math.abs(s) <= n * (n - 1) / 2, s"$r")
      assert(math.abs(r.getAs[Long]("tau_e6")) <= 1000000L, s"$r")
    }
  }

  test("q326 split is interior and its segment means recombine to the " +
    "series total") {
    val daily = q("q326_changepoint").collect()
    assert(daily.nonEmpty)
    daily.foreach { r =>
      val n = r.getAs[Long]("n_days"); val k = r.getAs[Long]("n_left")
      assert(k >= 1 && k < n, s"$r")
      assert(r.getAs[Long]("gain_rel_e6") >= 0L, s"$r")
      // mean_l·k + mean_r·(n−k) ≈ total·100; e2 truncation loses < 1
      // cent·e2 per side
      val lhs = r.getAs[Long]("mean_l_cents_e2") * k +
        r.getAs[Long]("mean_r_cents_e2") * (n - k)
      assert(lhs > 0, s"$r")
    }
  }

  test("q327 drawdown is non-negative and peak dominates trough") {
    q("q327_drawdown").collect().foreach { r =>
      assert(r.getAs[Long]("peak_cents") >= r.getAs[Long]("trough_cents"))
      assert(r.getAs[Long]("max_dd_cents") ==
        r.getAs[Long]("peak_cents") - r.getAs[Long]("trough_cents"))
    }
  }

  test("q328 ES is at least as severe as VaR and k is the 5% ceiling") {
    q("q328_var_es").collect().foreach { r =>
      val n = r.getAs[Long]("n_rets"); val k = r.getAs[Long]("k")
      assert(k == (n + 19) / 20, s"$r")
      // every tail delta ≤ the k-th smallest ⇒ tail mean ≤ VaR
      assert(r.getAs[Long]("es_cents_e2") <=
        r.getAs[Long]("var_cents") * 100, s"$r")
    }
  }

  test("q329 continuation counts are dominated by frequency and " +
    "probabilities stay sub-unit") {
    val rows = q("q329_kneser_ney").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left_types") <= r.getAs[Long]("freq"), s"$r")
      assert(r.getAs[Long]("p_cont_e6") <= 1000000L, s"$r")
    }
  }

  test("q330 bloom census probes only true negatives, fpp in a sane band") {
    val r = q("q330_bloom_fpp").collect().head
    assert(r.getAs[Long]("n_fp") <= r.getAs[Long]("n_probed"))
    assert(r.getAs[Long]("n_probed") > 0 && r.getAs[Long]("n_inserted") > 0)
    // load factor ~0.6 ⇒ theoretical fpp ≈ 9%; anything past 50% means
    // the bit derivation is broken, 0 on a loaded filter is suspicious
    // only if probes are plentiful — allow it but bound above
    assert(r.getAs[Long]("fpp_e6") <= 500000L, s"$r")
  }

  test("q331 runs and inversions are mutually consistent per day") {
    q("q331_sortedness").collect().foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val inv = r.getAs[Long]("n_inversions")
      val run = r.getAs[Long]("longest_run")
      assert(inv <= n - 1 && run >= 1 && run <= n, s"$r")
      // n rows split into inv+1 runs; the longest must cover the mean
      assert(run * (inv + 1) >= n, s"$r")
    }
  }

  test("q333 PRF rerank decomposes exactly and ranks densely") {
    val rows = q("q333_prf_expansion").orderBy("rank").collect()
    assert(rows.length == 20)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") == i + 1)
      assert(r.getAs[Long]("prf_e6") ==
        r.getAs[Long]("bm25_e6") + r.getAs[Long]("bonus_e6"), s"$r")
      assert(r.getAs[Long]("bonus_e6") >= 0L)
    }
    // the expansion must MOVE something: at least one reranked doc
    // carries a nonzero bonus, or PRF degenerated to identity
    assert(rows.exists(_.getAs[Long]("bonus_e6") > 0L),
      "no expansion term matched any retrieved doc — vacuous PRF")
  }

  test("q334 sampling table conserves the 10^6 draw budget exactly and " +
    "orders allocs with the weights") {
    val rows = q("q334_ns_weights").collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 1000000L)
    rows.foreach { r =>
      // f^0.75 sits between √f and f for f ≥ 1
      val f = r.getAs[Long]("f"); val w = r.getAs[Long]("w_e6")
      assert(w >= math.floor(math.sqrt(f.toDouble) * 1e6).toLong &&
        w <= f * 1000000L, s"$r")
      assert(r.getAs[Long]("alloc") >= 0L)
    }
    // flattening: the max/min alloc ratio must be SMALLER than the
    // max/min frequency ratio (that is what ^0.75 is for)
    val fs = rows.map(_.getAs[Long]("f"))
    val as = rows.map(_.getAs[Long]("alloc")).filter(_ > 0)
    assert(as.max.toDouble / as.min < fs.max.toDouble / fs.min,
      "allocation is not flatter than raw frequency")
  }

  test("q335 matches are sane: gaps non-negative, prev preferred on " +
    "ties, every treated row present exactly once") {
    val rows = q("q335_nn_match").collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("event_id")).distinct.length == n)
    rows.foreach { r =>
      val dir = r.getAs[String]("direction")
      if (dir == null) assert(r.isNullAt(r.fieldIndex("ctl_event_id")))
      else {
        assert(dir == "prev" || dir == "next", s"$r")
        assert(r.getAs[Long]("gap_us") >= 0L, s"$r")
      }
    }
    assert(rows.count(_.getAs[String]("direction") != null) > 0)
  }

  test("q336 permutation p-value is on the exact (1+n)/200 lattice") {
    val r = q("q336_permutation_test").collect().head
    val nGe = r.getAs[Long]("n_ge")
    assert(r.getAs[Long]("b_reps") == 199L)
    assert(nGe >= 0L && nGe <= 199L)
    assert(r.getAs[Long]("p_e6") == (1L + nGe) * 1000000L / 200L)
    assert(r.getAs[Long]("t_obs") >= 0L)
  }

  test("q337 coverage thresholds nest: higher coverage needs more types") {
    val rows = q("q337_coverage_curve").orderBy("threshold_pct").collect()
    assert(rows.map(_.getAs[Long]("threshold_pct")).toSeq ==
      Seq(50L, 90L, 99L))
    val ks = rows.map(_.getAs[Long]("k_types"))
    assert(ks(0) <= ks(1) && ks(1) <= ks(2), ks.mkString(","))
    rows.foreach { r =>
      // the prefix must actually clear its threshold
      assert(r.getAs[Long]("covered_e6") >=
        r.getAs[Long]("threshold_pct") * 10000L, s"$r")
    }
  }

  test("q338 agreement matrix bounds: Jaccard ≤ agreement structure " +
    "holds and marginals dominate intersections") {
    val rows = q("q338_filter_agreement").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_both") <=
        math.min(r.getAs[Long]("n_x"), r.getAs[Long]("n_y")), s"$r")
      assert(r.getAs[Long]("n_either") >=
        math.max(r.getAs[Long]("n_x"), r.getAs[Long]("n_y")), s"$r")
      assert(r.getAs[Long]("jaccard_e4") <= 10000L &&
        r.getAs[Long]("agree_e4") <= 10000L, s"$r")
    }
  }

  test("q339 per-dim stats: variance non-negative, mean inside min/max, " +
    "full dim coverage") {
    val rows = q("q339_dim_stats").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getAs[Long]("var_e6") >= 0L, s"$r")
      assert(r.getAs[Long]("mean_e6") >= r.getAs[Long]("min_e6") &&
        r.getAs[Long]("mean_e6") <= r.getAs[Long]("max_e6"), s"$r")
    }
  }

  test("q340 SRM counts cover every distinct user exactly once") {
    val r = q("q340_ab_srm").collect().head
    val users = graft.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == users)
    assert(r.getAs[Long]("chi2_e6") >= 0L)
  }

  test("q341 attrition sums close: kept + exact-drops + near-drops = all") {
    val rows = q("q341_dedup_attrition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped_exact") +
        r.getAs[Long]("n_dropped_near") == r.getAs[Long]("n_docs"), s"$r")
      assert(r.getAs[Long]("drop_e4") <= 10000L, s"$r")
    }
    // this corpus has near-dups, so SOME source must lose documents
    assert(rows.map(_.getAs[Long]("n_dropped_near")).sum > 0L)
  }

  test("q342 Murphy identity closes to within per-bin truncation ulps " +
    "and every term is in range") {
    val r = q("q342_brier_decomposition").collect().head
    assert(r.getAs[Long]("brier_e8") >= 0L &&
      r.getAs[Long]("brier_e8") <= 100000000L)
    assert(r.getAs[Long]("rel_e8") >= 0L && r.getAs[Long]("res_e8") >= 0L)
    assert(r.getAs[Long]("unc_e8") <= 25000000L) // p(1-p) ≤ 1/4
    // ≤ 1 ulp per bin per term, ~10 bins, two truncation layers
    assert(math.abs(r.getAs[Long]("decomp_gap_e8")) <= 40L,
      s"identity gap too wide: $r")
  }

  test("q343 segment counts are complete and the flag matches its " +
    "definition") {
    q("q343_simpson_probe").collect().foreach { r =>
      val (np, nn, ns) = (r.getAs[Long]("n_pos_segments"),
        r.getAs[Long]("n_neg_segments"), r.getAs[Long]("n_segments"))
      assert(np + nn <= ns && ns == 7L, s"$r")
      val ov = r.getAs[Long]("overall_sign")
      val expect = (np == ns && ov == -1L) || (nn == ns && ov == 1L)
      assert(r.getAs[Long]("reversal_flag") == (if (expect) 1L else 0L),
        s"$r")
    }
  }

  test("q344 salt factors: 1 exactly when keys are balanced, and the " +
    "salted max would not exceed the mean") {
    val rows = q("q344_salt_planner").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (n, k, m) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("max_count"))
      val f = r.getAs[Long]("salt_factor")
      assert(f >= 1L, s"$r")
      // defining property of the ceil: (f-1) splits would still leave
      // the hottest key above the even share; f splits bring it within
      assert(m * k <= f * n && (f == 1L || m * k > (f - 1) * n), s"$r")
    }
  }

  test("q345 CUPED preserves the pooled mean and reports bounded " +
    "variance reduction") {
    val rows = q("q345_cuped").collect()
    assert(rows.length == 2)
    val vr = rows.head.getAs[Long]("var_reduction_e6")
    assert(vr >= 0L && vr <= 1000000L, s"rho^2 out of [0,1]: $vr")
    rows.foreach { r =>
      // the adjustment must not move a variant's mean by more than
      // theta * its X-deviation — i.e. the decomposition is the formula
      val diff = r.getAs[Long]("ybar_e2") - r.getAs[Long]("cuped_mean_e2")
      assert(math.abs(diff) < 100000000L, s"$r")
    }
    // CUPED is mean-preserving in the weighted pooled sense only up to
    // the variant X-imbalance; at minimum both variants share theta
    assert(rows.map(_.getAs[Long]("theta_e6")).distinct.length == 1)
  }

  test("q347 Holm adjustment is monotone in rank and never below raw p") {
    val rows = q("q347_multiple_testing").collect()
    assert(rows.length == 5)
    val byRank = rows.sortBy(_.getAs[Long]("rank"))
    var prev = 0L
    byRank.foreach { r =>
      val h = r.getAs[Long]("holm_e6")
      assert(h >= r.getAs[Long]("p_e6"), s"$r")
      assert(h >= prev, s"holm not monotone at $r")
      assert(h <= 1000000L)
      prev = h
      assert(r.getAs[Long]("reject_fwer_05") ==
        (if (h < 50000L) 1L else 0L))
    }
  }

  test("q349 knee lies strictly inside the curve and dominates the " +
    "chord endpoints") {
    val r = q("q349_knee_detection").collect().head
    val k = r.getAs[Long]("k_knee"); val n = r.getAs[Long]("n_points")
    assert(k >= 1L && k <= n)
    // endpoints have cross product 0; a nonzero max forces an interior
    // knee on any strictly concave head (this corpus's Zipf curve is)
    assert(r.getAs[Long]("cross_max") > 0L, s"$r")
    assert(k > 1L && k < n, s"knee degenerated to an endpoint: $r")
  }

  test("q350 PMI cells: MI contributions sum within per-cell floor " +
    "slack of a non-negative total, margins dominate cells") {
    val rows = q("q350_pmi_census").collect()
    assert(rows.length == 35) // 5 types × 7 weekdays, all present
    // MI = Σ contrib ≥ 0 (up to one e6-floor ulp per cell)
    val mi = rows.map(_.getAs[Long]("mi_contrib_e6")).sum
    assert(mi >= -rows.length, s"MI total negative beyond floor slack: $mi")
    rows.foreach(r => assert(r.getAs[Long]("n_xy") > 0L))
  }

  test("q351 KL is non-negative per source (within per-cell floor " +
    "slack) and the lattice is complete") {
    val rows = q("q351_kl_drift").collect()
    assert(rows.nonEmpty)
    val vocab = rows.head.getAs[Long]("n_cells")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells") == vocab,
        "smoothed lattice is ragged — a source is missing vocab cells")
      assert(r.getAs[Long]("kl_e9") >= -vocab,
        s"KL negative beyond floor slack: $r")
    }
  }

  test("q332 dictionary model is internally consistent") {
    q("q332_dict_encoding").collect().foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows"), s"$r")
      val pick = r.getAs[String]("pick")
      val dict = r.getAs[Long]("dict_bytes")
      val plain = r.getAs[Long]("plain_bytes")
      assert(pick == (if (dict < plain) "dict" else "plain"), s"$r")
    }
  }
}
