package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Semantics of the trained-model quality gates (q363 NB classifier,
  * q364 bigram-LM cross-entropy) that the DuckDB hash cannot pin alone:
  * the models must actually LEARN — on a controlled corpus with a real
  * class signal the classifier must separate perfectly and the LM must
  * score in-distribution text strictly cheaper — plus the census
  * accounting invariants on the driver's own test data. */
class QualityModelSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** A corpus with DISJOINT vocabularies per language: English docs
    * speak only {alpha..delta}, the rest only {omega..sigma}. Any
    * learner worth shipping separates this perfectly. */
  private lazy val disjointDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_qm").toString
    val rows = (0L until 40L).map { i =>
      val en = i % 2 == 0
      val words =
        if (en) Seq("alpha", "beta", "gamma", "delta")
        else Seq("omega", "psi", "rho", "sigma")
      // vary doc length deterministically so token counts differ
      val text = Iterator.continually(words).flatten
        .take(8 + (i % 5).toInt).mkString(" ")
      (i, text, if (en) "en" else "xx", s"src${i % 3}", text.length.toLong)
    }
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("q363 separates a disjoint-vocabulary corpus perfectly — the " +
    "confusion census has no off-diagonal cells") {
    val cells = SparkEntry.queries("q363_nb_classifier")(spark, disjointDir)
      .collect()
      .map(r => (r.getAs[Long]("actual_en"), r.getAs[Long]("predicted_en")))
      .toSet
    assert(cells == Set((0L, 0L), (1L, 1L)),
      s"off-diagonal confusion cells on a separable corpus: $cells")
  }

  test("q364 scores in-distribution (en) text strictly cheaper than " +
    "out-of-distribution text on the disjoint-vocabulary corpus") {
    val census = SparkEntry.queries("q364_lm_cross_entropy")(
        spark, disjointDir)
      .collect().map(r => r.getAs[String]("lang") ->
        r.getAs[Long]("mean_ce_e6")).toMap
    assert(census("en") < census("xx"),
      s"LM did not prefer its own training distribution: $census")
    // every en bigram was seen in training or is the held-out tail of
    // the same tiny loop vocabulary — its max must stay under the gate
    assert(census.keySet == Set("en", "xx"))
  }

  test("q363 census partitions the held-out split exactly and each " +
    "cell's sum/min/max are mutually consistent") {
    val rows = q("q363_nb_classifier").collect()
    val heldOut = graft.Tables.load(spark, sf, "documents")
      .filter(!QualityModelQueries.isTrain(col("doc_id"))).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == heldOut,
      "confusion cells must partition the held-out docs")
    rows.foreach { r =>
      val (n, s, mn, mx) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_score_e6"), r.getAs[Long]("min_score_e6"),
        r.getAs[Long]("max_score_e6"))
      assert(mn <= mx && n * mn <= s && s <= n * mx,
        s"incoherent cell stats: $r")
      // prediction is sign(score): every score in a predicted-1 cell is
      // positive, every score in a predicted-0 cell is <= 0
      if (r.getAs[Long]("predicted_en") == 1L) assert(mn > 0L, s"$r")
      else assert(mx <= 0L, s"$r")
    }
  }

  test("q365 sweep is consistent with q363's census: the last row's " +
    "(tp, tp+fp) equal the census totals, tp/fp are monotone, and the " +
    "threshold-0 operating point reproduces the confusion matrix") {
    val sweep = q("q365_nb_threshold_sweep").orderBy(col("bucket").desc)
      .collect()
    val census = q("q363_nb_classifier").collect()
      .map(r => (r.getAs[Long]("actual_en"),
        r.getAs[Long]("predicted_en")) -> r.getAs[Long]("n_docs")).toMap
      .withDefaultValue(0L)
    val last = sweep.last
    assert(last.getAs[Long]("tp") == census((1L, 0L)) + census((1L, 1L)),
      "final cumulative tp must equal all actual-positive docs")
    assert(last.getAs[Long]("fp") == census((0L, 0L)) + census((0L, 1L)),
      "final cumulative fp must equal all actual-negative docs")
    sweep.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("tp") <= b.getAs[Long]("tp") &&
        a.getAs[Long]("fp") <= b.getAs[Long]("fp"),
        s"cumulative counts regressed: $a -> $b")
    }
    // q363 predicts at score > 0 <=> buckets >= 0 (floor maps (0, 1e5)
    // to bucket 0 and score <= 0 to buckets < 0, with bucket 0 holding
    // only positive scores since score_e6 = 0 floors to bucket 0 — the
    // boundary doc would be predicted 0; no such doc exists at this sf,
    // which the partition check below would expose as a cell mismatch)
    val atZero = sweep.filter(_.getAs[Long]("bucket") >= 0L)
    assert(atZero.map(_.getAs[Long]("n_pos")).sum == census((1L, 1L)),
      "bucket >= 0 positives must equal the census TP cell")
    assert(atZero.map(_.getAs[Long]("n_neg")).sum == census((0L, 1L)),
      "bucket >= 0 negatives must equal the census FP cell")
  }

  test("q366 cells partition the scored intersection and kappa is " +
    "bounded; on the disjoint-vocab corpus the gates must agree on en") {
    val r = q("q366_gate_agreement").head()
    assert(r.getAs[Long]("n") ==
      r.getAs[Long]("n_both_keep") + r.getAs[Long]("n_nb_only") +
        r.getAs[Long]("n_lm_only") + r.getAs[Long]("n_both_drop"))
    val k = r.getAs[Long]("kappa_e6")
    assert(k >= -1000000L && k <= 1000000L, s"kappa out of range: $k")
    // intersection = held-out docs with >= 1 bigram
    val expected = graft.Tables.load(spark, sf, "documents")
      .filter(!QualityModelQueries.isTrain(col("doc_id")) &&
        size(split(lower(trim(col("text"))), "\\s+")) >= 2).count()
    assert(r.getAs[Long]("n") == expected,
      s"scored intersection ${r.getAs[Long]("n")} != $expected")
  }

  test("q367 budget: quotas exhaust the 1e8 budget up to truncation, " +
    "tiers follow the score order, and epochs match quota/tokens") {
    val rows = q("q367_quality_budget").collect()
    val nSources = graft.Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSources, "every source must get a quota row")
    val quotaSum = rows.map(_.getAs[Long]("quota_tokens")).sum
    assert(quotaSum <= 100000000L &&
      100000000L - quotaSum < rows.length,
      s"quotas must exhaust the budget up to per-source truncation: " +
        s"$quotaSum")
    // tier boundaries respect the (mean score desc, source) rank order:
    // no tier-k source may outscore a tier-(k-1) source, with the name
    // tie-break deciding equal means
    val byRank = rows.sortBy(r =>
      (-r.getAs[Long]("mean_score_e6"), r.getAs[String]("source")))
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("tier") <= b.getAs[Long]("tier"),
        s"tier order violates score order: $a -> $b")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("mult") == 4L - r.getAs[Long]("tier"))
      val expectedEpochs = r.getAs[Long]("quota_tokens") * 10000L /
        r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("epochs_e4") == expectedEpochs, s"$r")
    }
  }

  test("q368 review sample stays inside the boundary band: keeps are " +
    "positive, drops non-positive, ranks dense from 1, <= 3 per side, " +
    "and each side's scores move away from the threshold with rank") {
    val rows = q("q368_review_sample").collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[String]("source"), r.getAs[String]("side")))
      .foreach { case ((_, side), rs) =>
        assert(rs.length <= 3)
        val sorted = rs.sortBy(_.getAs[Long]("rank"))
        assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
          (1L to rs.length).toSeq, s"ranks not dense: ${rs.toSeq}")
        val scores = sorted.map(_.getAs[Long]("score_e6")).toSeq
        if (side == "keep_worst") {
          assert(scores.forall(_ > 0L), s"keep side must be positive: $rs")
          assert(scores == scores.sorted, "keep_worst must ascend")
        } else {
          assert(scores.forall(_ <= 0L), s"drop side must be <= 0: $rs")
          assert(scores == scores.sorted.reverse, "drop_best must descend")
        }
      }
  }

  test("q369 ablation covers exactly the corpus build's mixed survivors " +
    "(q354's 6_mixed stage) and its cut counts are coherent") {
    val rows = q("q369_gate_ablation").collect()
    val mixedRow = q("q354_corpus_attrition")
      .filter(col("stage") === "6_mixed").head()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      mixedRow.getAs[Long]("n_docs"),
      "ablation must census every shipped doc, no more")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum ==
      mixedRow.getAs[Long]("n_tokens"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_cut") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_tokens_cut") <= r.getAs[Long]("n_tokens"))
      val frac = r.getAs[Long]("cut_frac_e4")
      assert(frac ==
        r.getAs[Long]("n_tokens_cut") * 10000L / r.getAs[Long]("n_tokens"),
        s"fraction does not match its own numerator/denominator: $r")
    }
  }

  test("q364 census: counts cover every multi-token doc, gate count is " +
    "bounded by the cell count, and nll means are non-negative") {
    val rows = q("q364_lm_cross_entropy").collect()
    val scorable = graft.Tables.load(spark, sf, "documents")
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scorable,
      "per-lang cells must cover every doc with at least one bigram")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_above_gate") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("min_ce_e6") >= 0L,
        s"add-one nll can never be negative: $r")
      assert(r.getAs[Long]("min_ce_e6") <= r.getAs[Long]("mean_ce_e6") &&
        r.getAs[Long]("mean_ce_e6") <= r.getAs[Long]("max_ce_e6"), s"$r")
    }
  }

  test("q371 calibration: buckets partition the held-out split, rates " +
    "match counts exactly, log-odds defined iff the bucket is two-sided, " +
    "and a perfectly-separated corpus pools into the clamp buckets") {
    val rows = q("q371_nb_calibration").collect()
    val heldOut = q("q363_nb_classifier")
      .agg(sum("n_docs")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == heldOut,
      "calibration buckets must cover exactly the held-out docs")
    rows.foreach { r =>
      val (b, n, p) = (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pos"))
      assert(b >= -8L && b <= 8L, s"bucket outside the clamp: $r")
      assert(p >= 0L && p <= n, s"positives outside [0, n]: $r")
      // exact round-half-up e4 rate
      assert(r.getAs[Long]("pos_rate_e4") == (p * 20000L + n) / (2L * n),
        s"rate drifted from its integer definition: $r")
      val oneSided = p == 0L || p == n
      assert(r.isNullAt(r.fieldIndex("emp_logodds_e6")) == oneSided,
        s"log-odds must be NULL exactly when one-sided: $r")
      if (!oneSided)
        assert(r.getAs[Long]("cal_gap_e6") ==
          r.getAs[Long]("emp_logodds_e6") - r.getAs[Long]("mid_e6"), s"$r")
    }
    // the disjoint-vocab corpus separates perfectly: every held-out doc
    // scores far from 0, so ONLY the clamp buckets (±8) survive and each
    // is pure — the curve's extreme reading for an extreme classifier
    val dj = SparkEntry.queries("q371_nb_calibration")(spark, disjointDir)
      .collect()
    assert(dj.map(_.getAs[Long]("bucket")).toSet == Set(-8L, 8L),
      s"disjoint corpus must pool into the clamp buckets: ${dj.toSeq}")
    dj.foreach { r =>
      val (b, n, p) = (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pos"))
      assert(if (b == 8L) p == n else p == 0L,
        s"clamp buckets must be pure on the separable corpus: $r")
    }
  }

  test("q372 LM operating table: buckets cover the held-out scorable " +
    "docs, kept counts are exact prefix sums, rates match their integer " +
    "definitions") {
    val rows = q("q372_lm_calibration").orderBy("bucket").collect()
    assert(rows.nonEmpty)
    // coverage: held-out docs with at least one bigram
    val trainFlag = QualityModelQueries.isTrain(col("doc_id"))
    val want = graft.Tables.load(spark, sf, "documents")
      .filter(!trainFlag)
      .filter(size(split(lower(trim(col("text"))), "\\s+")) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == want,
      s"buckets cover ${rows.map(_.getAs[Long]("n_docs")).sum}, " +
        s"held-out scorable = $want")
    var (kd, ke) = (0L, 0L)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 60L && b <= 80L, s"bucket outside the clamp: $r")
      val (n, e) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_en"))
      assert(e >= 0L && e <= n, s"en count outside [0, n]: $r")
      kd += n; ke += e
      assert(r.getAs[Long]("kept_docs") == kd &&
        r.getAs[Long]("kept_en") == ke,
        s"kept counts are not the prefix sums: $r (want $kd/$ke)")
      assert(r.getAs[Long]("en_rate_e4") == (e * 20000L + n) / (2L * n),
        s"rate drifted from its integer definition: $r")
      assert(r.getAs[Long]("kept_en_rate_e4") ==
        (ke * 20000L + kd) / (2L * kd), s"kept rate drifted: $r")
    }
  }
}
