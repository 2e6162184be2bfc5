package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The policy→build wiring (r16 verdict item 1): the corpus build's mix
  * stage water-fills each source to its POLICY-CERTIFIED token share
  * (`cap_s = ⌊t_total · quota_s / 10⁸⌋` from q375's policy-applied quota
  * table), so the q373 calibration verdict decides the SHIPPED corpus's
  * composition — not a hardcoded 4%. These tests pin the two claims the
  * driver hash cannot: (1) the water-fill itself matches an independent
  * Scala reimplementation (stage-salted order, straddler kept, exact cap
  * arithmetic), and (2) flipping the verdict on a drifted fixture — same
  * documents, same scores, only the calibration decision changed —
  * changes which documents ship. */
class MixPolicySpec extends SparkSuite {
  import spark.implicits._

  /** Two sources whose MEAN-SCORE ordering and EMPIRICAL-RATE ordering
    * disagree: srcA has the higher held-out mean NB score (tier 1 under
    * `mean_score_tiers`) but the lower positive rate (tier 2 under
    * `rank_by_emp_rate`), srcB the reverse. n = 10 docs scored each. */
  private def perSourceStats: DataFrame =
    Seq(
      ("srcA", 10L, BigDecimal(10000000L), 2L),
      ("srcB", 10L, BigDecimal(-5000000L), 9L))
      .toDF("source", "n_docs_scored", "sum_score_e6", "n_pos")
      .withColumn("sum_score_e6", col("sum_score_e6").cast("decimal(38,0)"))

  private def tokens: DataFrame =
    Seq(("srcA", 1000L), ("srcB", 1000L)).toDF("source", "n_tokens")

  private def verdict(calibrated: Long): DataFrame =
    Seq((calibrated,
      if (calibrated == 1L) "mean_score_tiers" else "rank_by_emp_rate"))
      .toDF("calibrated", "policy")

  /** 5 docs of 200 tokens per source; t_total = 2000. */
  private def clean: DataFrame =
    (0L until 10L).map(i =>
      (i, if (i < 5) "srcA" else "srcB", 200L))
      .toDF("doc_id", "source", "n_tokens")

  private def quotaOf(calibrated: Long): Map[String, Long] =
    QualityModelQueries
      .policyQuotaTable(perSourceStats, tokens, verdict(calibrated))
      .collect().map(r =>
        r.getAs[String]("source") -> r.getAs[Long]("quota_tokens")).toMap

  private def mixedOf(calibrated: Long): DataFrame =
    CurationQueries.mixStage(clean,
      QualityModelQueries
        .policyQuotaTable(perSourceStats, tokens, verdict(calibrated))
        .select(col("source"), col("quota_tokens")))

  test("policyQuotaTable: the flipped verdict swaps the tier ordering " +
    "and therefore the quotas") {
    // calibrated: srcA mult 3, srcB mult 2 → 60M/40M of the 10⁸ budget
    assert(quotaOf(1L) == Map("srcA" -> 60000000L, "srcB" -> 40000000L))
    // flipped: the emp-rate ordering ranks srcB first → 40M/60M
    assert(quotaOf(0L) == Map("srcA" -> 40000000L, "srcB" -> 60000000L))
  }

  test("mixStage equals an independent water-fill reimplementation " +
    "(stage-salted order, straddler kept, cap = ⌊t_total·quota/10⁸⌋)") {
    for (cal <- Seq(1L, 0L)) {
      val quota = quotaOf(cal)
      // independent replay: per source, order docs by (md5-u32 of the
      // SALTED id, doc_id), keep while cum − n < cap
      val rows = clean
        .withColumn("u32", graft.functions.Hashing.md5U32(
          concat(lit("mix:"), col("doc_id").cast("string"))))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("u32")))
      val tTotal = rows.map(_._3).sum
      val want = rows.groupBy(_._2).toSeq.flatMap { case (src, docs) =>
        val cap = quota(src) * tTotal / 100000000L
        var cum = 0L
        docs.sortBy(d => (d._4, d._1)).toSeq.flatMap { d =>
          cum += d._3
          if (cum - d._3 < cap) Some(d._1) else None
        }
      }.toSet
      val got = mixedOf(cal).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == want, s"calibrated=$cal: " +
        s"only-mix=${(got -- want).take(5)} only-replay=${(want -- got).take(5)}")
    }
  }

  test("policySensitivityTable: each ordering's quota column equals " +
    "policyQuotaTable under the matching forced verdict") {
    val sens = QualityModelQueries
      .policySensitivityTable(perSourceStats, tokens, verdict(1L))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("quota_mean_tokens"),
          r.getAs[Long]("quota_emp_tokens"),
          r.getAs[Long]("delta_tokens"))).toMap
    val mean = quotaOf(1L) // calibrated verdict applies the mean ordering
    val empq = quotaOf(0L) // flipped verdict applies the emp-rate ordering
    sens.foreach { case (src, (qm, qe, d)) =>
      assert(qm == mean(src), s"$src mean-ordering quota diverged")
      assert(qe == empq(src), s"$src emp-ordering quota diverged")
      assert(d == qe - qm, s"$src delta inconsistent")
    }
    // on the drifted fixture the orderings DISAGREE — the sensitivity
    // table's whole point is showing that this corpus is verdict-bound
    assert(sens.values.exists(_._3 != 0L),
      "fixture orderings agree — sensitivity test is vacuous")
  }

  test("q377 mix audit: caps, availability, shipped, and binding are " +
    "mutually consistent on the real build") {
    val rows = graft.SparkEntry
      .queries("q377_policy_mix_audit")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty, "empty audit — vacuous")
    val tTotal = rows.map(_.getAs[Long]("n_tokens_avail")).sum
    rows.foreach { r =>
      val cap = r.getAs[Long]("cap_tokens")
      val avail = r.getAs[Long]("n_tokens_avail")
      val shipped = r.getAs[Long]("n_tokens_shipped")
      assert(shipped <= avail, s"shipped more than available: $r")
      // a non-binding cap keeps the whole source (water-fill identity)
      if (r.getAs[Long]("cap_binding") == 0L)
        assert(shipped == avail, s"non-binding cap trimmed anyway: $r")
      // a zero quota ships nothing — the silent-drop channel, visible
      if (r.getAs[Long]("quota_tokens") == 0L)
        assert(shipped == 0L && cap == 0L, s"zero quota shipped: $r")
      if (cap > 0L) assert(!r.isNullAt(r.fieldIndex("util_e4")),
        s"util_e4 null with a positive cap: $r")
    }
    // caps are shares of the clean total: Σ⌊quota·T/10⁸⌋ ≤ T, and each
    // source loses < 1 at the quota floor (< T/10⁸ tokens) plus < 1 at
    // the cap floor
    val capSum = rows.map(_.getAs[Long]("cap_tokens")).sum
    val floorLoss = 2L * rows.length + (tTotal * rows.length) / 100000000L
    assert(capSum <= tTotal && capSum >= tTotal - floorLoss,
      s"cap sum $capSum vs t_total $tTotal drifted past floor loss")
  }

  test("a flipped verdict on the drifted fixture CHANGES the shipped " +
    "corpus's composition — same docs, same scores, different corpus") {
    def composition(df: DataFrame): Map[String, Long] =
      df.groupBy("source").agg(sum("n_tokens").as("t"))
        .collect().map(r =>
          r.getAs[String]("source") -> r.getAs[Long]("t")).toMap
    val cal = composition(mixedOf(1L))
    val flip = composition(mixedOf(0L))
    // caps: 1200/800 under the calibrated verdict, 800/1200 flipped —
    // with 200-token docs the straddler convention keeps 5/4 vs 4/5 docs
    assert(cal == Map("srcA" -> 1000L, "srcB" -> 800L),
      s"calibrated composition drifted: $cal")
    assert(flip == Map("srcA" -> 800L, "srcB" -> 1000L),
      s"flipped composition drifted: $flip")
    assert(cal != flip, "the verdict flip did not change the corpus")
  }
}
