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
