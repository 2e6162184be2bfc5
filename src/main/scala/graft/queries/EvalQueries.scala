package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Rounding

/** Model/heuristic EVALUATION operators — the measurement half every
  * curation pipeline needs next to its filters: once two screening rules
  * (or a score and a label) exist, the pipeline must quantify them
  * before trusting them at corpus scale. The fixtures are deterministic
  * feature-threshold stumps over `events` (value ≥ 50 currency units;
  * props payload length ≥ 40) against the purchase label — the
  * MACHINERY (exact PR sweep, paired-difference test, chance-corrected
  * agreement) is the operator; swap any scorer in. Everything stays on
  * the exact integer grid (cents, counts, e6 rationals via
  * [[graft.functions.Rounding]]), so the DuckDB oracle hash-matches
  * bit-for-bit. */
object EvalQueries extends QueryPack {

  import Rounding.{cents, centsSql, intDivExact, intDivExactSql}

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").filter(col("value").isNotNull)

  /** Exact precision–recall curve by threshold sweep — the evaluation a
    * retrieval/filter stack runs INSTEAD of a single accuracy number
    * when positives are rare: scores bucket to whole currency units
    * (the scale lever: the curve's row count is the distinct-bucket
    * count, never the corpus — at 100 TB the same e0 grid yields the
    * same ≤~10³-row curve), one aggregation counts per-bucket
    * positives/negatives, one cumulative window (over the BOUNDED
    * bucket table) sweeps the threshold from the highest score down,
    * and precision/recall are exact e6 rationals at every operating
    * point. Ties share a bucket by construction, dodging the
    * tie-ordering ambiguity a row-level sweep has. */
  private def q322(s: SparkSession, dir: String): DataFrame = {
    val scored = ev(s, dir).select(
      Rounding.intDiv(cents(col("value")), lit(100L)).as("score_unit"),
      (col("event_type") === "purchase").cast("long").as("pos"))
    val buckets = scored.groupBy("score_unit")
      .agg(sum("pos").as("n_pos"),
        sum(lit(1L) - col("pos")).as("n_neg"))
    val w = Window.orderBy(col("score_unit").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = scored.agg(sum("pos").as("p_total"))
    buckets
      .withColumn("tp", sum("n_pos").over(w))
      .withColumn("fp", sum("n_neg").over(w))
      .crossJoin(broadcast(tot))
      .select(col("score_unit"), col("n_pos"), col("n_neg"),
        col("tp"), col("fp"),
        intDivExact(
          col("tp").cast("decimal(38,0)") * lit(2000000L) +
            (col("tp") + col("fp")),
          lit(2L) * (col("tp") + col("fp"))).as("precision_e6"),
        intDivExact(
          col("tp").cast("decimal(38,0)") * lit(2000000L) + col("p_total"),
          lit(2L) * col("p_total")).as("recall_e6"))
      .orderBy(col("score_unit").desc)
  }

  /** The two stump classifiers every eval query here shares: A fires on
    * value ≥ 50 units, B on a props payload ≥ 40 chars. */
  private def stumps(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).select(
      (col("event_type") === "purchase").cast("long").as("truth"),
      (cents(col("value")) >= 5000L).cast("long").as("pred_a"),
      (coalesce(length(col("props")), lit(0)) >= 40).cast("long")
        .as("pred_b"))

  private val stumpsSql: String =
    s"""SELECT CAST(event_type = 'purchase' AS BIGINT) AS truth,
       |  CAST(${centsSql("value")} >= 5000 AS BIGINT) AS pred_a,
       |  CAST(coalesce(length(props), 0) >= 40 AS BIGINT) AS pred_b
       |FROM events WHERE value IS NOT NULL""".stripMargin

  /** McNemar's paired test — "is classifier B actually better than A,
    * or is the delta noise?" answered the statistically correct way for
    * two rules scored on the SAME rows (independent-sample tests
    * overstate significance on paired data): only the discordant counts
    * b (A right, B wrong) and c (A wrong, B right) matter, and the
    * continuity-corrected statistic (|b−c|−1)²/(b+c) is one exact e6
    * rational. One full-scan aggregation — the 100 TB shape is a single
    * map-side-combined count, no shuffle wider than one row. */
  private def q323(s: SparkSession, dir: String): DataFrame =
    stumps(s, dir)
      .select(
        ((col("pred_a") === col("truth")) &&
          (col("pred_b") =!= col("truth"))).cast("long").as("is_b"),
        ((col("pred_a") =!= col("truth")) &&
          (col("pred_b") === col("truth"))).cast("long").as("is_c"))
      .agg(count(lit(1)).as("n"), sum("is_b").as("b"), sum("is_c").as("c"))
      .select(col("n"), col("b"), col("c"),
        when(col("b") + col("c") === 0L, lit(null).cast("long")).otherwise(
          intDivExact(
            (abs(col("b") - col("c")) - lit(1L)).cast("decimal(38,0)") *
              (abs(col("b") - col("c")) - lit(1L)) * lit(1000000L),
            col("b") + col("c"))).as("mcnemar_e6"))

  /** Cohen's kappa — chance-corrected agreement between the two rules
    * (no truth column needed): κ = (p_o − p_e)/(1 − p_e) computed as
    * ONE exact signed rational on the common n² denominator,
    * κ_e6 = (a·n − r1·c1 − r0·c0)·10⁶ div (n² − r1·c1 − r0·c0)
    * ([[Rounding.intDivExact]] truncates dividend-signed; both engines
    * agree). Raw agreement rides along so the chance correction is
    * visible — on skewed marginals p_o alone flatters any pair of
    * rules. Same single-aggregation scale shape as q323. */
  private def q324(s: SparkSession, dir: String): DataFrame =
    stumps(s, dir)
      .agg(count(lit(1)).as("n"),
        sum((col("pred_a") === col("pred_b")).cast("long")).as("agree"),
        sum("pred_a").as("r1"), sum("pred_b").as("c1"))
      .select(col("n"), col("agree"),
        intDivExact(
          col("agree").cast("decimal(38,0)") * lit(2000000L) + col("n"),
          lit(2L) * col("n")).as("p_o_e6"),
        intDivExact(
          (col("agree").cast("decimal(38,0)") * col("n") -
            col("r1").cast("decimal(38,0)") * col("c1") -
            (col("n") - col("r1")).cast("decimal(38,0)") *
              (col("n") - col("c1"))) * lit(1000000L),
          col("n").cast("decimal(38,0)") * col("n") -
            col("r1").cast("decimal(38,0)") * col("c1") -
            (col("n") - col("r1")).cast("decimal(38,0)") *
              (col("n") - col("c1"))).as("kappa_e6"))

  /** Filter-ensemble agreement matrix — before a curation stack chains
    * three quality screens, it should know whether they are measuring
    * the same thing: per pair of filters (length ≥ 300 chars,
    * 8-gram redundancy ≥ 0.98 — q319's oracle core as a screen, token
    * count ≥ 60), the exact Jaccard of their keep-sets and the raw
    * agreement rate (both-keep + both-drop). Highly redundant filters
    * (J → 1) waste compute; near-disjoint ones (J → 0) multiply into an
    * unintentionally tiny corpus. One full scan computes every flag,
    * ONE aggregation computes every pairwise count (no joins at all),
    * and the 3-row matrix falls out of a bounded union — the cheapest
    * possible shape at any scale. */
  /** The three document-quality screens shared by q338 (pairwise
    * agreement matrix) and q358 (Fleiss panel κ): length ≥ 300 chars,
    * 8-gram redundancy ≥ 0.98 (q319's oracle core as a screen), token
    * count ≥ 60. One scan, three codegen'd flags. */
  private def filterFlags(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        (length(col("text")) >= 300).cast("long").as("a"),
        (expr("CASE WHEN length(text) < 8 THEN 0 ELSE " +
          "(size(array_distinct(transform(sequence(1, " +
          "int(greatest(length(text) - 7, 0))), " +
          "i -> substring(text, i, 8)))) * 20000L + (length(text) - 7)) " +
          "div (2L * (length(text) - 7)) END") >= 9800L)
          .cast("long").as("b"),
        (graft.functions.TextAnalysis.tokenCount(col("text")) >= 60L)
          .cast("long").as("c"))

  /** DuckDB twin of [[filterFlags]] (plain triple-quote: `\S+` stays
    * literal). */
  private val flagsSql: String =
    """SELECT CAST(length(text) >= 300 AS BIGINT) AS a,
      |    CAST(CASE WHEN length(text) < 8 THEN 0 ELSE
      |      (len(list_distinct([substr(text, i, 8)
      |         for i in range(1, greatest(length(text) - 6, 1))]))
      |       * 20000 + (length(text) - 7))
      |      // (2 * (length(text) - 7)) END >= 9800 AS BIGINT) AS b,
      |    CAST(len(regexp_extract_all(text, '\S+')) >= 60 AS BIGINT)
      |      AS c
      |  FROM documents""".stripMargin

  private def q338(s: SparkSession, dir: String): DataFrame = {
    import Rounding.intDivExact
    val flags = filterFlags(s, dir)
    val agg = flags.agg(count(lit(1)).as("n"),
      sum("a").as("na"), sum("b").as("nb"), sum("c").as("nc"),
      sum(col("a") * col("b")).as("nab"),
      sum(col("a") * col("c")).as("nac"),
      sum(col("b") * col("c")).as("nbc"))
    def pairRow(name: String, nx: String, ny: String, both: String) =
      agg.select(lit(name).as("pair"),
        col(nx).as("n_x"), col(ny).as("n_y"), col(both).as("n_both"),
        (col(nx) + col(ny) - col(both)).as("n_either"),
        intDivExact(
          col(both).cast("decimal(38,0)") * lit(20000L) +
            (col(nx) + col(ny) - col(both)),
          lit(2L) * (col(nx) + col(ny) - col(both))).as("jaccard_e4"),
        intDivExact(
          (col("n") - col(nx) - col(ny) + lit(2L) * col(both))
            .cast("decimal(38,0)") * lit(20000L) + col("n"),
          lit(2L) * col("n")).as("agree_e4"))
    pairRow("len|redund", "na", "nb", "nab")
      .unionByName(pairRow("len|tokens", "na", "nc", "nac"))
      .unionByName(pairRow("redund|tokens", "nb", "nc", "nbc"))
      .orderBy("pair")
  }

  /** Murphy decomposition of the Brier score — the proper-scoring
    * analysis behind q305's calibration bins: with the forecast pinned
    * to its decile MIDPOINT (so the within-bin-variance term is zero by
    * construction and the identity is exact), Brier = reliability −
    * resolution + uncertainty, every term an exact e8 rational
    * (per-bin truncation then one final division — deterministic on
    * both engines; `decomp_gap_e8` carries the residual truncation
    * ulps, pinned near zero in the spec). Reliability says "are the
    * stated probabilities honest", resolution "do they separate
    * outcomes", uncertainty the outcome-rate floor — the three numbers
    * that actually diagnose a score, where raw Brier alone conflates
    * them. One scan → one 10-row bin aggregate → one row out. */
  private def q342(s: SparkSession, dir: String): DataFrame = {
    import Rounding.intDivExact
    val rows = ev(s, dir).select(
      least(Rounding.intDiv(cents(col("value")), lit(1000L)), lit(9L))
        .as("bin"),
      (col("event_type") === "purchase").cast("long").as("o"))
      .withColumn("pe4", col("bin") * lit(1000L) + lit(500L))
    val bins = rows.groupBy("bin", "pe4")
      .agg(count(lit(1)).as("n_k"), sum("o").as("s_o"))
    val tot = bins.agg(sum("n_k").as("n"), sum("s_o").as("o_all"))
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val contrib = bins.crossJoin(broadcast(tot))
      .select(
        intDivExact(
          (d38(col("n_k")) * col("pe4") - d38(col("s_o")) * lit(10000L)) *
            (d38(col("n_k")) * col("pe4") - d38(col("s_o")) * lit(10000L)),
          col("n_k")).as("rel_c"),
        intDivExact(
          (d38(col("s_o")) * col("n") - d38(col("o_all")) * col("n_k")) *
            (d38(col("s_o")) * col("n") - d38(col("o_all")) * col("n_k")) *
            lit(100000000L),
          d38(col("n_k")) * col("n") * col("n")).as("res_c"))
    val terms = contrib.agg(sum("rel_c").as("rel_s"), sum("res_c").as("res_s"))
    val brier = rows
      .select(((col("pe4") - lit(10000L) * col("o")) *
        (col("pe4") - lit(10000L) * col("o"))).cast("decimal(38,0)")
        .as("sq"))
      .agg(sum("sq").as("b_s"))
    brier.crossJoin(broadcast(terms)).crossJoin(broadcast(tot))
      .select(col("n"),
        intDivExact(col("b_s"), col("n")).as("brier_e8"),
        intDivExact(col("rel_s").cast("decimal(38,0)"), col("n"))
          .as("rel_e8"),
        intDivExact(col("res_s").cast("decimal(38,0)"), col("n"))
          .as("res_e8"),
        intDivExact(
          d38(col("o_all")) * (col("n") - col("o_all")) * lit(100000000L),
          d38(col("n")) * col("n")).as("unc_e8"))
      .withColumn("decomp_gap_e8",
        col("brier_e8") - (col("rel_e8") - col("res_e8") + col("unc_e8")))
  }

  /** Simpson's-paradox probe — the aggregation hazard every analytics
    * layer should surface rather than assume away: per event type, the
    * SIGN of the hour-of-day ↔ value association computed overall and
    * within each weekday segment (exact integer covariance numerators
    * n·Σxy − Σx·Σy — no division, no floats, sign is the whole
    * question). A reversal (every segment agrees on one sign, the
    * pooled sign flips) is the textbook confounding signature; the
    * census also exposes the mixed in-between. One two-level
    * aggregation over the corpus; segments are the bounded weekday
    * dimension. */
  private def q343(s: SparkSession, dir: String): DataFrame = {
    val base = ev(s, dir).select(col("event_type"),
      expr("weekday(to_date(ts))").cast("long").as("wd"),
      hour(col("ts")).cast("long").as("x"),
      cents(col("value")).as("y"))
    def covSign(g: DataFrame, keys: Seq[String]): DataFrame =
      g.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"))
        // sign via exact comparison on the decimal(38,0) numerator —
        // the r12 form cast to decimal(38,2) first, which in non-ANSI
        // mode nulled out at |num| ≥ 1e36; this form moves the cliff to
        // ~1e38 (n·Σxy itself can still overflow decimal(38,0)), and the
        // requireNotNull guard makes that cliff LOUD instead of letting
        // an overflowed segment contribute sign 0 (ADVICE r13). The
        // guard fires ONLY when the inputs are non-null (a segment whose
        // values are all NULL — the non-ANSI malformed-data convention —
        // legitimately has a null numerator and keeps the r12 sign-0
        // reading; conflating it with overflow would raise a misleading
        // error on tolerated dirty rows)
        .withColumn("num",
          when(col("sxy").isNull || col("sx").isNull || col("sy").isNull,
            lit(null).cast("decimal(38,0)"))
            .otherwise(graft.functions.Rounding.requireNotNull(
              col("n") * col("sxy") -
                col("sx").cast("decimal(38,0)") * col("sy"),
              "q343 covariance numerator overflowed decimal(38,0)")))
        .withColumn("sgn", when(col("num") > 0, 1L)
          .when(col("num") < 0, -1L).otherwise(0L))
    val overall = covSign(base, Seq("event_type"))
      .select(col("event_type"), col("sgn").as("overall_sign"))
    val seg = covSign(base, Seq("event_type", "wd"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_segments"),
        sum((col("sgn") === 1L).cast("long")).as("n_pos_segments"),
        sum((col("sgn") === -1L).cast("long")).as("n_neg_segments"))
    overall.join(seg, "event_type")
      .withColumn("reversal_flag",
        ((col("n_pos_segments") === col("n_segments") &&
          col("overall_sign") === -1L) ||
          (col("n_neg_segments") === col("n_segments") &&
            col("overall_sign") === 1L)).cast("long"))
      .orderBy("event_type")
  }

  /** Holm step-down multiple-testing correction — what turns five
    * per-type permutation p-values into an honest family-wise answer
    * (read five raw 0.05 tests and the false-alarm rate is ~23%): per
    * event type, the q336-style sign-flip permutation p on day-over-day
    * deltas (md5-seeded, exact (1+n)/(B+1) lattice), then Holm's
    * adjusted p = running max over the (p asc, type asc) rank order of
    * min((m−r+1)·p, 1) — pure integer arithmetic on the e6 lattice, a
    * bounded m-row window. The whole shape is one daily aggregation +
    * one (type, b)-keyed flip aggregation + an m-row correction — the
    * permutation fan-out multiplies the CALENDAR table only. */
  private def q347(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import Rounding.intDiv
    import graft.functions.Hashing
    val b = 199
    val diffs = ev(s, dir).select(col("event_type"),
        to_date(col("ts")).as("day"), cents(col("value")).as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("x"))
      .withColumn("d", col("x") - lag("x", 1).over(
        Window.partitionBy("event_type").orderBy("day")))
      .filter(col("d").isNotNull)
      .withColumn("day_s", date_format(col("day"), "yyyy-MM-dd"))
    val obs = diffs.groupBy("event_type")
      .agg(abs(sum("d")).as("t_obs"), count(lit(1)).as("n_days"))
    val flips = diffs.crossJoin(
        s.range(1, b + 1).select(col("id").as("b")))
      .withColumn("sgn", when(Hashing.md5U32(concat(col("event_type"),
        lit(":"), col("day_s"), lit(":"), col("b"))) % 2L === 0L, 1L)
        .otherwise(-1L))
      .groupBy("event_type", "b")
      .agg(abs(sum(col("sgn") * col("d"))).as("t_b"))
    val p = flips.join(obs, "event_type")
      .groupBy(col("event_type"), col("n_days"))
      .agg(sum((col("t_b") >= col("t_obs")).cast("long")).as("n_ge"))
      .withColumn("p_e6",
        intDiv((lit(1L) + col("n_ge")) * lit(1000000L),
          lit((b + 1).toLong)))
    val m = p.agg(count(lit(1)).as("m"))
    val ord = Window.orderBy(col("p_e6"), col("event_type"))
    p.crossJoin(broadcast(m))
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("step",
        least((col("m") - col("rank") + lit(1L)) * col("p_e6"),
          lit(1000000L)))
      .withColumn("holm_e6", max("step").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_type"), col("n_days"), col("p_e6"), col("rank"),
        col("holm_e6"),
        (col("holm_e6") < 50000L).cast("long").as("reject_fwer_05"))
      .orderBy("event_type")
  }

  /** Pointwise-mutual-information census between event type and weekday
    * — the dependence question q301's χ² answers with one number,
    * decomposed to WHICH cells carry it: per (type, weekday) cell,
    * PMI = ln(n_xy·N / (n_x·n_y)) and its MI contribution
    * n_xy·PMI / N. Float discipline is the q115 entropy pattern: ln
    * runs on exact-in-double INTEGER products (all ≤ ~10¹² ≪ 2⁵³), the
    * whole double chain is written identically on both engines, and
    * each term floors onto the e6 grid before any sum. Cells are the
    * bounded type × weekday lattice; one aggregation over the corpus
    * feeds it. */
  private def q350(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(s, dir, "events")
      .select(col("event_type"), expr("weekday(to_date(ts))").cast("long")
        .as("wd"))
    val cells = base.groupBy("event_type", "wd")
      .agg(count(lit(1)).as("n_xy"))
    val mx = base.groupBy("event_type").agg(count(lit(1)).as("n_x"))
    val my = base.groupBy("wd").agg(count(lit(1)).as("n_y"))
    val tot = base.agg(count(lit(1)).as("n"))
    val lnArg = (col("n_xy").cast("double") * col("n").cast("double")) /
      (col("n_x").cast("double") * col("n_y").cast("double"))
    cells.join(broadcast(mx), "event_type").join(broadcast(my), "wd")
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("wd"), col("n_xy"),
        floor(log(lnArg) * lit(1000000.0) + lit(0.5)).cast("long")
          .as("pmi_e6"),
        floor((col("n_xy").cast("double") * log(lnArg) /
          col("n").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long").as("mi_contrib_e6"))
      .orderBy("event_type", "wd")
  }

  /** Fleiss' κ over the [[filterFlags]] panel — the chance-corrected
    * agreement number for ≥3 raters (Cohen's κ, q324, stops at two).
    * Named consumer: q338's pairwise matrix says WHICH two screens
    * overlap; this one number decides whether the panel as a whole is
    * one redundant vote (κ → 1: drop all but the cheapest screen) or
    * independent signals (κ → 0: chaining them multiplies survival
    * rates, budget accordingly). With n = 3 binary raters and
    * x = keep-votes per item, the statistic collapses to three scalars
    * N, S = Σx, Q = Σx²:  P̄ = (Q − 3S + 3N)/3N,
    * P̄ₑ = (S² + (3N−S)²)/9N², and
    * κ = (3N(Q − 3S + 3N) − S² − (3N−S)²) / (9N² − S² − (3N−S)²) —
    * ONE full-scan map-side-combined aggregation, every division an
    * exact e6 rational (trunc-toward-zero on both engines, so a
    * negative κ still hash-matches). Degenerate unanimity (P̄ₑ = 1)
    * yields null, the q323 convention. */
  private def q358(s: SparkSession, dir: String): DataFrame =
    filterFlags(s, dir)
      .select((col("a") + col("b") + col("c")).as("x"))
      .agg(count(lit(1)).as("n_items"), sum("x").as("s_votes"),
        sum(col("x") * col("x")).as("q_votes2"))
      .select(col("n_items"), col("s_votes"), col("q_votes2"),
        intDivExact(
          (col("q_votes2") - lit(3L) * col("s_votes") +
            lit(3L) * col("n_items")).cast("decimal(38,0)") *
            lit(1000000L),
          lit(3L) * col("n_items")).as("p_bar_e6"),
        intDivExact(
          (col("s_votes").cast("decimal(38,0)") * col("s_votes") +
            (lit(3L) * col("n_items") - col("s_votes"))
              .cast("decimal(38,0)") *
              (lit(3L) * col("n_items") - col("s_votes"))) *
            lit(1000000L),
          lit(9L) * col("n_items").cast("decimal(38,0)") * col("n_items"))
          .as("p_e_e6"),
        {
          val n = col("n_items").cast("decimal(38,0)")
          val sv = col("s_votes").cast("decimal(38,0)")
          val dropV = lit(3L) * n - sv
          val den = lit(9L) * n * n - sv * sv - dropV * dropV
          when(den === 0L, lit(null).cast("long")).otherwise(
            intDivExact(
              (lit(3L) * n *
                (col("q_votes2") - lit(3L) * col("s_votes") +
                  lit(3L) * col("n_items")).cast("decimal(38,0)") -
                sv * sv - dropV * dropV) * lit(1000000L),
              den)).as("fleiss_kappa_e6")
        })

  /** One-way ANOVA F across event-type groups — the variance
    * decomposition a pipeline runs before trusting a per-segment mean
    * difference (does the segmentation explain more variance than it
    * leaves?): everything on the exact integer grid — observations in
    * cents, per-group ⌊S_g²/n_g⌋ and global ⌊S²/n⌋ truncated once each
    * (a DEFINED statistic, replayed term-for-term by the oracle), SSB =
    * Σ⌊S_g²/n_g⌋ − ⌊S²/n⌋, SSW = ΣX² − Σ⌊S_g²/n_g⌋, F in e6 fixed point
    * via one decimal(38) division. Scale: ONE partial-aggregated pass
    * over the fact table into k group rows, then k-row arithmetic — the
    * same posture at 100 TB (decimal(38) carries S² exactly to ~10¹²
    * rows of max-cents values). Guards agree with the oracle: F is NULL
    * unless df_b > 0, SSW > 0, and SSB ≥ 0 (truncation can push an
    * all-equal-means SSB a few units below zero; a defined NULL beats a
    * floor-vs-truncate sign divergence). */
  private def q391(s: SparkSession, dir: String): DataFrame = {
    val g = ev(s, dir)
      .select(col("event_type"), cents(col("value")).as("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_g"),
        sum(col("x").cast("decimal(38,0)")).as("s_g"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("q_g"))
      .withColumn("ssg", intDivExact(col("s_g") * col("s_g"), col("n_g")))
    val tot = g.agg(
        sum("n_g").as("n"), sum(col("s_g")).as("s"),
        sum(col("q_g")).as("q"),
        sum(col("ssg").cast("decimal(38,0)")).as("sum_ssg"),
        count(lit(1)).as("k"))
      .withColumn("ss_mean", intDivExact(col("s") * col("s"), col("n")))
      .withColumn("ssb", (col("sum_ssg") - col("ss_mean")).cast("long"))
      .withColumn("ssw",
        (col("q").cast("decimal(38,0)") - col("sum_ssg")).cast("long"))
      .withColumn("df_b", (col("k") - 1).cast("long"))
      .withColumn("df_w", (col("n") - col("k")).cast("long"))
      .withColumn("f_e6",
        when(col("df_b") > 0 && col("ssw") > 0 && col("ssb") >= 0,
          intDivExact(
            lit(1000000L) * col("ssb").cast("decimal(38,0)") * col("df_w"),
            col("df_b").cast("decimal(38,0)") * col("ssw")))
          .otherwise(lit(null).cast("long")))
    g.crossJoin(broadcast(
        tot.select("ssb", "ssw", "df_b", "df_w", "f_e6")))
      .select(col("event_type"), col("n_g"),
        col("s_g").cast("long").as("sum_cents"),
        intDivExact(lit(100L) * col("s_g"), col("n_g")).as("mean_e2"),
        col("ssb").as("ssb_cents2"), col("ssw").as("ssw_cents2"),
        col("df_b"), col("df_w"), col("f_e6"))
      .orderBy("event_type")
  }

  /** Delete-one-day (block) jackknife for the corpus mean — the
    * uncertainty readout for a pipeline-level ratio metric whose rows
    * are NOT independent within a day (ingest batches, campaign days):
    * blocks are calendar days, each leave-one-day-out estimate is the
    * exact e4 ratio ⌊10⁴·(S−S_d)/(n−n_d)⌋, and the jackknife variance
    * ⌊(G−1)·Σ(θ̂₋d − θ̄)²/G⌋ (e8) weighs how much any single day steers
    * the headline number. All integer after the one defined e4
    * truncation per estimate — the oracle replays it term-for-term.
    * Scale: one partial-aggregated pass to G day rows, then G-row
    * arithmetic; the whole uncertainty analysis costs one groupBy at
    * any corpus size. */
  private def q392(s: SparkSession, dir: String): DataFrame = {
    val d = ev(s, dir)
      .select(to_date(col("ts")).as("day"), cents(col("value")).as("x"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_d"),
        sum(col("x").cast("decimal(38,0)")).as("s_d"))
    val tot = d.agg(sum("n_d").as("n"), sum(col("s_d")).as("s"),
      count(lit(1)).as("g"))
    val del = d.crossJoin(broadcast(tot))
      .withColumn("theta_del_e4", intDivExact(
        lit(10000L) * (col("s") - col("s_d")), col("n") - col("n_d")))
      .withColumn("theta_e4", intDivExact(lit(10000L) * col("s"), col("n")))
    val bar = del.agg(
        intDivExact(sum(col("theta_del_e4").cast("decimal(38,0)")),
          first("g")).as("theta_bar_e4"),
        first("g").as("gg"))
    val jk = del.crossJoin(broadcast(bar))
      .agg(intDivExact(
          (first("gg") - lit(1L)).cast("decimal(38,0)") *
            sum(((col("theta_del_e4") - col("theta_bar_e4")) *
              (col("theta_del_e4") - col("theta_bar_e4")))
              .cast("decimal(38,0)")),
          first("gg")).as("jk_var_e8"))
    del.crossJoin(broadcast(jk))
      .select(col("day"), col("n_d"),
        col("s_d").cast("long").as("sum_cents"),
        col("theta_del_e4"), col("theta_e4"), col("g").as("n_blocks"),
        col("jk_var_e8"))
      .orderBy("day")
  }

  /** Deterministic Poisson bootstrap CI for per-segment means — THE
    * distributed bootstrap (resampling 100 TB with replacement is
    * impossible, but each row's count in replicate b is ~Poisson(1),
    * drawable independently per row): replicate weight w(b, row) =
    * inverse-Poisson(1)-CDF of the md5U32 of (b, event_id) — exact
    * integer thresholds at 2³² scale, capped at 5, identical constants
    * in both engines — so the whole B=32 resample is ONE
    * partial-aggregated pass over a 32-fold flatMap, no shuffle of the
    * fact table, no RNG state, reproducible on any cluster layout.
    * Each replicate mean is the exact e4 ratio; the reported interval
    * is the B=32 min/max envelope (the conservative quantile pick at
    * this replicate count — widen B for percentile CIs, the plan shape
    * is unchanged). Scale: B multiplies map-side work only; the
    * aggregate state is k·B cells. */
  private def q393(s: SparkSession, dir: String): DataFrame =
    bootstrapCiOf(ev(s, dir))

  /** The q393 chain over a GIVEN events frame — the form the streaming
    * bootstrap twin re-derives per micro-batch (StreamingSpec):
    * replicate weights are per-row independent (md5 of (b, event_id)),
    * but every replicate MEAN and both envelope ends are full-corpus
    * decisions — a new arrival moves them all — so the twin re-derives
    * rather than appends, and the interval visibly tightens as the
    * corpus grows. */
  private[graft] def bootstrapCiOf(evDf: DataFrame): DataFrame = {
    import graft.functions.Hashing
    // adaptive fan-out (r20, guide §2.5): the 32-fold replicate explode
    // and its md5 weights are fused onto the scan's map stage, and the
    // one-row-group fixture file gives that stage ONE partition — the
    // whole B=32 resample ran on one core. The fan-out exchanges only
    // (type, id, cents) rows and no-ops once input splits fill the
    // session parallelism.
    val x = graft.operators.ReadParallelism.fanOut(
      evDf.select(col("event_type"), col("event_id"),
        cents(col("value")).as("x")),
      col("event_id"))
    val u = Hashing.md5U32(concat(col("b").cast("string"), lit(":"),
      col("event_id").cast("string")))
    val rep = x
      .select(col("event_type"), col("x"), col("event_id"),
        explode(sequence(lit(0L), lit(31L))).as("b"))
      .withColumn("w",
        when(u < 1580030168L, 0L).when(u < 3160060337L, 1L)
          .when(u < 3950075421L, 2L).when(u < 4213413783L, 3L)
          .when(u < 4279248373L, 4L).otherwise(5L))
    val ci = rep.groupBy("event_type", "b")
      .agg(sum((col("w") * col("x")).cast("decimal(38,0)")).as("wx"),
        sum("w").as("sw"))
      .filter(col("sw") > 0)
      .select(col("event_type"),
        intDivExact(lit(10000L) * col("wx"), col("sw")).as("m_e4"))
      .groupBy("event_type")
      .agg(min("m_e4").as("lo_e4"), max("m_e4").as("hi_e4"),
        count(lit(1)).as("b_reps"))
    val pt = x.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("x").cast("decimal(38,0)")).as("sx"))
      .select(col("event_type"), col("n_events"),
        intDivExact(lit(10000L) * col("sx"), col("n_events"))
          .as("point_e4"))
    pt.join(broadcast(ci), Seq("event_type"))
      .select("event_type", "n_events", "point_e4", "lo_e4", "hi_e4",
        "b_reps")
      .orderBy("event_type")
  }

  /** Robust per-segment means — trimmed and winsorized — via bounded
    * value-histogram order statistics (the q322 PR-curve trick pointed
    * at robust location estimates): a heavy-tailed or corrupted
    * segment drags its raw mean arbitrarily; the 5%-trimmed mean
    * (drop k = ⌊N/20⌋ from each tail) and winsorized mean (clamp those
    * k to the cut values) are the standard robust readouts. NO
    * data-wide sort or rank: observations land on the exact cents
    * grid, so ONE aggregation builds the per-(segment, value)
    * histogram (row count bounded by segment × distinct cents, never
    * the corpus), a cumulative window over that BOUNDED table places
    * each value's below/above mass, and per-value kept counts
    * (n − clamp(k−below) − clamp(k−above), provably ≥ 0 while
    * N > 2k) yield the trimmed sum exactly. The cut values are the
    * order statistics at ranks k+1 and N−k read off the same
    * cumulative. All e4 fixed point, one defined truncation per
    * mean. */
  private def q394(s: SparkSession, dir: String): DataFrame = {
    val h = ev(s, dir)
      .select(col("event_type"), cents(col("value")).as("x"))
      .groupBy("event_type", "x").agg(count(lit(1)).as("n"))
    val tot = h.groupBy("event_type")
      .agg(sum("n").as("nn"),
        sum(col("x").cast("decimal(38,0)") * col("n")).as("sx"))
      .withColumn("k", Rounding.intDiv(col("nn"), lit(20L)))
    val w = Window.partitionBy("event_type").orderBy("x")
    val c = h
      .withColumn("below", coalesce(sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(tot, "event_type")
      .withColumn("above", col("nn") - col("below") - col("n"))
      .withColumn("cut_lo",
        greatest(lit(0L), least(col("n"), col("k") - col("below"))))
      .withColumn("cut_hi",
        greatest(lit(0L), least(col("n"), col("k") - col("above"))))
    c.groupBy("event_type").agg(
        first("nn").as("n_events"), first("k").as("k_trim"),
        first("sx").as("sx"),
        sum(col("x").cast("decimal(38,0)") *
          (col("n") - col("cut_lo") - col("cut_hi"))).as("tsum"),
        min(when(col("below") + col("n") >= col("k") + 1, col("x")))
          .as("lo_cut"),
        max(when(col("above") + col("n") >= col("k") + 1, col("x")))
          .as("hi_cut"))
      .select(col("event_type"), col("n_events"), col("k_trim"),
        col("lo_cut"), col("hi_cut"),
        intDivExact(lit(10000L) * col("sx"), col("n_events"))
          .as("mean_e4"),
        intDivExact(lit(10000L) * col("tsum"),
          col("n_events") - lit(2L) * col("k_trim"))
          .as("trimmed_mean_e4"),
        intDivExact(lit(10000L) * (col("tsum") +
            (col("k_trim") * col("lo_cut")).cast("decimal(38,0)") +
            (col("k_trim") * col("hi_cut")).cast("decimal(38,0)")),
          col("n_events")).as("winsor_mean_e4"))
      .orderBy("event_type")
  }

  /** Mann–Whitney rank-sum census over every segment pair — the
    * nonparametric two-sample test a pipeline runs when segment value
    * distributions are nowhere near normal (the t-test's assumptions
    * fail on heavy-tailed revenue-like columns; rank-sum only needs
    * exchangeability): for each unordered event-type pair, the exact
    * tie-corrected U statistic and its e6 z² — all integer, no
    * data-wide ranking. Midranks come DOUBLED off the merged bounded
    * histogram (2·R(x) = 2·below + n_t + 1 is always integer), so
    * 2U₁ = ΣR₂ − n₁(n₁+1) stays exact, and
    * z² = 3·(2U₁ − n₁n₂)²·n(n−1) / (n₁n₂·((n+1)n(n−1) − Σ(t³−t)))
    * multiplies out every denominator into one decimal(38) division
    * (guarded NULL when all observations tie — the only zero
    * denominator). Scale: the pair fan-out joins each segment's
    * histogram into its (k−1) pairs — O(k·hist) rows, windows
    * partitioned per pair over bounded value tables, never the
    * corpus. */
  private def q395(s: SparkSession, dir: String): DataFrame = {
    val h = ev(s, dir)
      .select(col("event_type"), cents(col("value")).as("x"))
      .groupBy("event_type", "x").agg(count(lit(1)).as("n"))
    val types = h.select("event_type").distinct()
    val pairs = types.as("a").join(types.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
    val sides = pairs.select(col("ta"), col("tb"), col("ta").as("t"))
      .unionAll(pairs.select(col("ta"), col("tb"), col("tb").as("t")))
    val ph = h.join(broadcast(sides), col("event_type") === col("t"))
      .groupBy("ta", "tb", "x")
      .agg(sum(when(col("t") === col("ta"), col("n")).otherwise(0L))
          .as("na"),
        sum(when(col("t") === col("tb"), col("n")).otherwise(0L))
          .as("nb"))
    val w = Window.partitionBy("ta", "tb").orderBy("x")
    val c = ph.withColumn("nt", col("na") + col("nb"))
      .withColumn("below", coalesce(sum("nt").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("r2", lit(2L) * col("below") + col("nt") + lit(1L))
    c.groupBy("ta", "tb").agg(
        sum("na").as("n_a"), sum("nb").as("n_b"),
        sum(col("na").cast("decimal(38,0)") * col("r2")).as("r1_2"),
        sum(col("nt").cast("decimal(38,0)") * col("nt") * col("nt") -
          col("nt")).as("ties"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("u2", (col("r1_2") -
        col("n_a").cast("decimal(38,0)") * (col("n_a") + lit(1L)))
        .cast("long"))
      .withColumn("den",
        col("n_a").cast("decimal(38,0)") * col("n_b") *
          ((col("n") + lit(1L)).cast("decimal(38,0)") * col("n") *
            (col("n") - lit(1L)) - col("ties")))
      .withColumn("delta", col("u2").cast("decimal(38,0)") -
        col("n_a").cast("decimal(38,0)") * col("n_b"))
      .withColumn("z2_e6",
        when(col("den") > 0, intDivExact(
          lit(1000000L) * col("delta") * col("delta") * lit(3L) *
            col("n") * (col("n") - lit(1L)),
          col("den"))).otherwise(lit(null).cast("long")))
      .select(col("ta"), col("tb"), col("n_a"), col("n_b"), col("u2"),
        col("ties").cast("long").as("ties_term"), col("z2_e6"))
      .orderBy("ta", "tb")
  }

  val defs: Map[String, Q] = Map(
    "q394_trimmed_mean" -> (q394 _),
    "q395_mann_whitney" -> (q395 _),
    "q391_anova_f" -> (q391 _),
    "q392_jackknife_day" -> (q392 _),
    "q393_poisson_bootstrap" -> (q393 _),
    "q350_pmi_census" -> (q350 _),
    "q322_pr_curve" -> (q322 _),
    "q323_mcnemar" -> (q323 _),
    "q324_cohen_kappa" -> (q324 _),
    "q358_fleiss_kappa" -> (q358 _),
    "q338_filter_agreement" -> (q338 _),
    "q342_brier_decomposition" -> (q342 _),
    "q343_simpson_probe" -> (q343 _),
    "q347_multiple_testing" -> (q347 _))

  val oracle: Map[String, String] = Map(
    // the same bounded-histogram order statistics: cumulative window
    // over (segment, cents-value) rows, clamped per-value trim cuts,
    // rank-(k+1)/(N−k) cut values, one defined e4 truncation per mean
    "q394_trimmed_mean" ->
      s"""WITH x AS (
        |  SELECT event_type, ${centsSql("value")} AS x
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, x, count(*) AS n FROM x GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, sum(n) AS nn,
        |    sum(CAST(x AS HUGEINT) * n) AS sx, sum(n) // 20 AS k
        |  FROM h GROUP BY 1),
        |c AS (
        |  SELECT h.event_type, h.x, h.n, nn, sx, k,
        |    coalesce(sum(h.n) OVER (PARTITION BY h.event_type
        |      ORDER BY h.x ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      1 PRECEDING), 0) AS below
        |  FROM h JOIN tot USING (event_type)),
        |c2 AS (
        |  SELECT *, nn - below - n AS above,
        |    greatest(0, least(n, k - below)) AS cut_lo,
        |    greatest(0, least(n, k - (nn - below - n))) AS cut_hi
        |  FROM c),
        |res AS (
        |  SELECT event_type, any_value(nn) AS n_events,
        |    any_value(k) AS k_trim, any_value(sx) AS sx,
        |    sum(CAST(x AS HUGEINT) * (n - cut_lo - cut_hi)) AS tsum,
        |    min(CASE WHEN below + n >= k + 1 THEN x END) AS lo_cut,
        |    max(CASE WHEN above + n >= k + 1 THEN x END) AS hi_cut
        |  FROM c2 GROUP BY 1)
        |SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(k_trim AS BIGINT) AS k_trim,
        |  lo_cut, hi_cut,
        |  CAST((10000 * sx) // n_events AS BIGINT) AS mean_e4,
        |  CAST((10000 * tsum) // (n_events - 2 * k_trim) AS BIGINT)
        |    AS trimmed_mean_e4,
        |  CAST((10000 * (tsum + CAST(k_trim AS HUGEINT) * lo_cut
        |    + CAST(k_trim AS HUGEINT) * hi_cut)) // n_events AS BIGINT)
        |    AS winsor_mean_e4
        |FROM res ORDER BY event_type""".stripMargin,
    // doubled midranks off the merged histogram keep every rank
    // integer; the z² multiplies out all denominators into one HUGEINT
    // division, guarded NULL exactly where the engine guards (all-tie
    // pair)
    "q395_mann_whitney" ->
      s"""WITH x AS (
        |  SELECT event_type, ${centsSql("value")} AS x
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, x, count(*) AS n FROM x GROUP BY 1, 2),
        |tp AS (SELECT DISTINCT event_type FROM h),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM tp a JOIN tp b ON a.event_type < b.event_type),
        |sides AS (
        |  SELECT ta, tb, ta AS t FROM pairs
        |  UNION ALL SELECT ta, tb, tb FROM pairs),
        |ph AS (
        |  SELECT ta, tb, x,
        |    sum(CASE WHEN t = ta THEN n ELSE 0 END) AS na,
        |    sum(CASE WHEN t = tb THEN n ELSE 0 END) AS nb
        |  FROM h JOIN sides ON h.event_type = sides.t
        |  GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT *, na + nb AS nt,
        |    coalesce(sum(na + nb) OVER (PARTITION BY ta, tb ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below
        |  FROM ph),
        |res AS (
        |  SELECT ta, tb, sum(na) AS n_a, sum(nb) AS n_b,
        |    sum(CAST(na AS HUGEINT) * (2 * below + nt + 1)) AS r1_2,
        |    sum(CAST(nt AS HUGEINT) * nt * nt - nt) AS ties
        |  FROM c GROUP BY 1, 2),
        |r2 AS (
        |  SELECT *, n_a + n_b AS n,
        |    r1_2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS u2,
        |    CAST(n_a AS HUGEINT) * n_b *
        |      (CAST(n_a + n_b + 1 AS HUGEINT) * (n_a + n_b) *
        |        (n_a + n_b - 1) - ties) AS den
        |  FROM res)
        |SELECT ta, tb, CAST(n_a AS BIGINT) AS n_a,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(u2 AS BIGINT) AS u2,
        |  CAST(ties AS BIGINT) AS ties_term,
        |  CASE WHEN den > 0 THEN
        |    CAST((1000000 * (u2 - CAST(n_a AS HUGEINT) * n_b) *
        |      (u2 - CAST(n_a AS HUGEINT) * n_b) * 3 * n * (n - 1))
        |      // den AS BIGINT)
        |  ELSE NULL END AS z2_e6
        |FROM r2 ORDER BY ta, tb""".stripMargin,
    // HUGEINT products mirror the engine's decimal(38) chain; the two
    // defined truncations (per-group ⌊S_g²/n_g⌋, global ⌊S²/n⌋) replay
    // term-for-term, and the F guard (df_b > 0, SSW > 0, SSB ≥ 0)
    // agrees so floor-vs-truncate can never diverge on a negative
    "q391_anova_f" ->
      s"""WITH x AS (
        |  SELECT event_type, ${centsSql("value")} AS x
        |  FROM events WHERE value IS NOT NULL),
        |g AS (
        |  SELECT event_type, count(*) AS n_g,
        |    sum(CAST(x AS HUGEINT)) AS s_g,
        |    sum(CAST(x AS HUGEINT) * x) AS q_g
        |  FROM x GROUP BY 1),
        |g2 AS (SELECT *, (s_g * s_g) // n_g AS ssg FROM g),
        |tot AS (
        |  SELECT sum(n_g) AS n, sum(s_g) AS s, sum(q_g) AS q,
        |    sum(ssg) AS sum_ssg, count(*) AS k
        |  FROM g2),
        |t2 AS (SELECT *, (s * s) // n AS ss_mean FROM tot),
        |t3 AS (
        |  SELECT CAST(sum_ssg - ss_mean AS BIGINT) AS ssb,
        |    CAST(q - sum_ssg AS BIGINT) AS ssw,
        |    CAST(k - 1 AS BIGINT) AS df_b, CAST(n - k AS BIGINT) AS df_w
        |  FROM t2)
        |SELECT event_type, n_g, CAST(s_g AS BIGINT) AS sum_cents,
        |  CAST((100 * s_g) // n_g AS BIGINT) AS mean_e2,
        |  ssb AS ssb_cents2, ssw AS ssw_cents2, df_b, df_w,
        |  CASE WHEN df_b > 0 AND ssw > 0 AND ssb >= 0 THEN
        |    CAST((1000000 * CAST(ssb AS HUGEINT) * df_w)
        |      // (CAST(df_b AS HUGEINT) * ssw) AS BIGINT)
        |  ELSE NULL END AS f_e6
        |FROM g2, t3 ORDER BY event_type""".stripMargin,
    // each leave-one-day-out e4 ratio truncates once, exactly where the
    // engine truncates; the variance chain is pure integer after that
    "q392_jackknife_day" ->
      s"""WITH x AS (
        |  SELECT CAST(ts AS DATE) AS day, ${centsSql("value")} AS x
        |  FROM events WHERE value IS NOT NULL),
        |d AS (
        |  SELECT day, count(*) AS n_d, sum(CAST(x AS HUGEINT)) AS s_d
        |  FROM x GROUP BY 1),
        |tot AS (SELECT sum(n_d) AS n, sum(s_d) AS s, count(*) AS g
        |        FROM d),
        |del AS (
        |  SELECT day, n_d, s_d, n, s, g,
        |    CAST((10000 * (s - s_d)) // (n - n_d) AS BIGINT)
        |      AS theta_del_e4,
        |    CAST((10000 * s) // n AS BIGINT) AS theta_e4
        |  FROM d, tot),
        |bar AS (
        |  SELECT CAST(sum(CAST(theta_del_e4 AS HUGEINT)) // any_value(g)
        |      AS BIGINT) AS theta_bar_e4,
        |    any_value(g) AS gg
        |  FROM del),
        |jk AS (
        |  SELECT CAST((CAST(any_value(gg) - 1 AS HUGEINT) *
        |      sum(CAST((theta_del_e4 - theta_bar_e4) AS HUGEINT) *
        |        (theta_del_e4 - theta_bar_e4))) // any_value(gg)
        |      AS BIGINT) AS jk_var_e8
        |  FROM del, bar)
        |SELECT day, n_d, CAST(s_d AS BIGINT) AS sum_cents,
        |  theta_del_e4, theta_e4, CAST(g AS BIGINT) AS n_blocks,
        |  jk_var_e8
        |FROM del, jk ORDER BY day""".stripMargin,
    // the replicate weights replay the md5 inverse-CDF with the same
    // integer thresholds; each replicate mean truncates once; the CI is
    // the min/max envelope over the 32 replicate rows
    "q393_poisson_bootstrap" -> {
      val u = graft.functions.Hashing.md5U32Sql(
        "CAST(b AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)")
      s"""WITH x AS (
        |  SELECT event_type, event_id, ${centsSql("value")} AS x
        |  FROM events WHERE value IS NOT NULL),
        |rep AS (
        |  SELECT event_type, x.x, b, $u AS u
        |  FROM x, unnest(generate_series(0, 31)) t(b)),
        |wt AS (
        |  SELECT event_type, x, b,
        |    CASE WHEN u < 1580030168 THEN 0
        |         WHEN u < 3160060337 THEN 1
        |         WHEN u < 3950075421 THEN 2
        |         WHEN u < 4213413783 THEN 3
        |         WHEN u < 4279248373 THEN 4
        |         ELSE 5 END AS w
        |  FROM rep),
        |mm AS (
        |  SELECT event_type, b,
        |    CAST((10000 * sum(CAST(w AS HUGEINT) * x)) // sum(w)
        |      AS BIGINT) AS m_e4
        |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
        |ci AS (
        |  SELECT event_type, min(m_e4) AS lo_e4, max(m_e4) AS hi_e4,
        |    count(*) AS b_reps
        |  FROM mm GROUP BY 1),
        |pt AS (
        |  SELECT event_type, count(*) AS n_events,
        |    CAST((10000 * sum(CAST(x AS HUGEINT))) // count(*)
        |      AS BIGINT) AS point_e4
        |  FROM x GROUP BY 1)
        |SELECT pt.event_type, n_events, point_e4, lo_e4, hi_e4, b_reps
        |FROM pt JOIN ci USING (event_type)
        |ORDER BY event_type""".stripMargin
    },
    // identical double chain: integer-product ln args, per-term e6 floor
    "q350_pmi_census" ->
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS wd
        |  FROM events),
        |cells AS (SELECT event_type, wd, CAST(count(*) AS BIGINT) AS n_xy
        |          FROM base GROUP BY 1, 2),
        |mx AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_x
        |       FROM base GROUP BY 1),
        |my AS (SELECT wd, CAST(count(*) AS BIGINT) AS n_y
        |       FROM base GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base)
        |SELECT c.event_type, c.wd, n_xy,
        |  CAST(floor(ln((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)) /
        |      (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
        |    * 1000000.0 + 0.5) AS BIGINT) AS pmi_e6,
        |  CAST(floor((CAST(n_xy AS DOUBLE) *
        |      ln((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)) /
        |        (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))) /
        |      CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |    AS mi_contrib_e6
        |FROM cells c JOIN mx USING (event_type) JOIN my USING (wd), tot
        |ORDER BY c.event_type, c.wd""".stripMargin,
    // same per-type sign-flip lattice, same (p asc, type) Holm walk
    "q347_multiple_testing" -> {
      val u = graft.functions.Hashing.md5U32Sql(
        "event_type || ':' || day_s || ':' || b")
      s"""WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(${centsSql("value")}) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |diffs AS (
        |  SELECT event_type, strftime(day, '%Y-%m-%d') AS day_s,
        |    x - lag(x) OVER (PARTITION BY event_type ORDER BY day) AS d
        |  FROM daily),
        |dd AS (SELECT * FROM diffs WHERE d IS NOT NULL),
        |obs AS (
        |  SELECT event_type, CAST(abs(sum(d)) AS BIGINT) AS t_obs,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM dd GROUP BY 1),
        |flips AS (
        |  SELECT event_type, b, CAST(abs(sum(
        |      CASE WHEN $u % 2 = 0 THEN d ELSE -d END)) AS BIGINT) AS t_b
        |  FROM dd CROSS JOIN (SELECT unnest(generate_series(1, 199)) AS b)
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT f.event_type, any_value(n_days) AS n_days,
        |    CAST((1 + sum(CASE WHEN t_b >= t_obs THEN 1 ELSE 0 END))
        |      * 1000000 // 200 AS BIGINT) AS p_e6
        |  FROM flips f JOIN obs o ON f.event_type = o.event_type
        |  GROUP BY f.event_type),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
        |rk AS (
        |  SELECT p.*, m.m,
        |    CAST(row_number() OVER (ORDER BY p_e6, event_type) AS BIGINT)
        |      AS rank
        |  FROM p, m),
        |holm AS (
        |  SELECT *, CAST(max(least((m - rank + 1) * p_e6, 1000000))
        |    OVER (ORDER BY p_e6, event_type ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS holm_e6
        |  FROM rk)
        |SELECT event_type, n_days, p_e6, rank, holm_e6,
        |  CAST(holm_e6 < 50000 AS BIGINT) AS reject_fwer_05
        |FROM holm ORDER BY event_type""".stripMargin
    },
    // same decile-midpoint forecast, same per-bin truncation order
    "q342_brier_decomposition" -> {
      val relC = intDivExactSql(
        "(CAST(n_k AS HUGEINT) * pe4 - CAST(s_o AS HUGEINT) * 10000) * " +
          "(CAST(n_k AS HUGEINT) * pe4 - CAST(s_o AS HUGEINT) * 10000)",
        "n_k")
      val resC = intDivExactSql(
        "(CAST(s_o AS HUGEINT) * n - CAST(o_all AS HUGEINT) * n_k) * " +
          "(CAST(s_o AS HUGEINT) * n - CAST(o_all AS HUGEINT) * n_k) * " +
          "100000000", "CAST(n_k AS HUGEINT) * n * n")
      val bE8 = intDivExactSql("b_s", "n")
      val relE8 = intDivExactSql("CAST(rel_s AS HUGEINT)", "n")
      val resE8 = intDivExactSql("CAST(res_s AS HUGEINT)", "n")
      val uncE8 = intDivExactSql(
        "CAST(o_all AS HUGEINT) * (n - o_all) * 100000000",
        "CAST(n AS HUGEINT) * n")
      s"""WITH rows_ AS (
        |  SELECT least(${centsSql("value")} // 1000, 9) AS bin,
        |    CAST(event_type = 'purchase' AS BIGINT) AS o
        |  FROM events WHERE value IS NOT NULL),
        |rp AS (SELECT bin, bin * 1000 + 500 AS pe4, o FROM rows_),
        |bins AS (
        |  SELECT bin, pe4, CAST(count(*) AS BIGINT) AS n_k,
        |    CAST(sum(o) AS BIGINT) AS s_o
        |  FROM rp GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
        |  CAST(sum(s_o) AS BIGINT) AS o_all FROM bins),
        |contrib AS (
        |  SELECT $relC AS rel_c, $resC AS res_c FROM bins, tot),
        |terms AS (SELECT CAST(sum(rel_c) AS HUGEINT) AS rel_s,
        |  CAST(sum(res_c) AS HUGEINT) AS res_s FROM contrib),
        |brier AS (
        |  SELECT CAST(sum(CAST(pe4 - 10000 * o AS HUGEINT) *
        |    (pe4 - 10000 * o)) AS HUGEINT) AS b_s FROM rp),
        |fin AS (
        |  SELECT n, $bE8 AS brier_e8, $relE8 AS rel_e8,
        |    $resE8 AS res_e8, $uncE8 AS unc_e8
        |  FROM brier, terms, tot)
        |SELECT n, brier_e8, rel_e8, res_e8, unc_e8,
        |  brier_e8 - (rel_e8 - res_e8 + unc_e8) AS decomp_gap_e8
        |FROM fin""".stripMargin
    },
    // same integer covariance numerators; sign census per weekday
    "q343_simpson_probe" ->
      s"""WITH base AS (
        |  SELECT event_type,
        |    CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS wd,
        |    CAST(extract(hour FROM ts) AS BIGINT) AS x,
        |    ${centsSql("value")} AS y
        |  FROM events WHERE value IS NOT NULL),
        |ov AS (
        |  SELECT event_type,
        |    CAST(sign(CAST(count(*) AS HUGEINT) *
        |      sum(CAST(x AS HUGEINT) * y) -
        |      CAST(sum(x) AS HUGEINT) * sum(y)) AS BIGINT)
        |      AS overall_sign
        |  FROM base GROUP BY event_type),
        |segs AS (
        |  SELECT event_type, wd,
        |    CAST(sign(CAST(count(*) AS HUGEINT) *
        |      sum(CAST(x AS HUGEINT) * y) -
        |      CAST(sum(x) AS HUGEINT) * sum(y)) AS BIGINT) AS sgn
        |  FROM base GROUP BY event_type, wd),
        |seg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
        |    CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos_segments,
        |    CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_neg_segments
        |  FROM segs GROUP BY event_type)
        |SELECT ov.event_type, overall_sign, n_segments, n_pos_segments,
        |  n_neg_segments,
        |  CAST((n_pos_segments = n_segments AND overall_sign = -1) OR
        |       (n_neg_segments = n_segments AND overall_sign = 1)
        |    AS BIGINT) AS reversal_flag
        |FROM ov JOIN seg ON ov.event_type = seg.event_type
        |ORDER BY ov.event_type""".stripMargin,
    // same three flags, one aggregation, same exact pair rationals
    "q338_filter_agreement" -> {
      val jac = (both: String, either: String) => intDivExactSql(
        s"CAST($both AS HUGEINT) * 20000 + ($either)", s"2 * ($either)")
      val agr = (nx: String, ny: String, both: String) => intDivExactSql(
        s"CAST(n - $nx - $ny + 2 * $both AS HUGEINT) * 20000 + n", "2 * n")
      s"""WITH flags AS ($flagsSql),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb,
        |    CAST(sum(c) AS BIGINT) AS nc,
        |    CAST(sum(a * b) AS BIGINT) AS nab,
        |    CAST(sum(a * c) AS BIGINT) AS nac,
        |    CAST(sum(b * c) AS BIGINT) AS nbc
        |  FROM flags)
        |SELECT 'len|redund' AS pair, na AS n_x, nb AS n_y, nab AS n_both,
        |  na + nb - nab AS n_either,
        |  ${jac("nab", "na + nb - nab")} AS jaccard_e4,
        |  ${agr("na", "nb", "nab")} AS agree_e4 FROM agg
        |UNION ALL
        |SELECT 'len|tokens', na, nc, nac, na + nc - nac,
        |  ${jac("nac", "na + nc - nac")}, ${agr("na", "nc", "nac")}
        |FROM agg
        |UNION ALL
        |SELECT 'redund|tokens', nb, nc, nbc, nb + nc - nbc,
        |  ${jac("nbc", "nb + nc - nbc")}, ${agr("nb", "nc", "nbc")}
        |FROM agg
        |ORDER BY pair""".stripMargin
    },
    "q358_fleiss_kappa" -> {
      val pBar = intDivExactSql(
        "CAST(qv - 3 * sv + 3 * n AS HUGEINT) * 1000000", "3 * n")
      val pE = intDivExactSql(
        "(CAST(sv AS HUGEINT) * sv + " +
          "CAST(3 * n - sv AS HUGEINT) * (3 * n - sv)) * 1000000",
        "9 * CAST(n AS HUGEINT) * n")
      val kapDen = "9 * CAST(n AS HUGEINT) * n - " +
        "CAST(sv AS HUGEINT) * sv - " +
        "CAST(3 * n - sv AS HUGEINT) * (3 * n - sv)"
      val kap = intDivExactSql(
        "(3 * CAST(n AS HUGEINT) * (qv - 3 * sv + 3 * n) - " +
          "CAST(sv AS HUGEINT) * sv - " +
          "CAST(3 * n - sv AS HUGEINT) * (3 * n - sv)) * 1000000",
        kapDen)
      s"""WITH flags AS ($flagsSql),
        |votes AS (SELECT a + b + c AS x FROM flags),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sv,
        |    CAST(sum(x * x) AS BIGINT) AS qv FROM votes)
        |SELECT n AS n_items, sv AS s_votes, qv AS q_votes2,
        |  $pBar AS p_bar_e6, $pE AS p_e_e6,
        |  CASE WHEN $kapDen = 0 THEN NULL ELSE $kap END
        |    AS fleiss_kappa_e6
        |FROM agg""".stripMargin
    },
    "q322_pr_curve" -> {
      val prec = intDivExactSql(
        "CAST(tp AS HUGEINT) * 2000000 + (tp + fp)", "2 * (tp + fp)")
      val rec = intDivExactSql(
        "CAST(tp AS HUGEINT) * 2000000 + p_total", "2 * p_total")
      s"""WITH scored AS (
         |  SELECT ${centsSql("value")} // 100 AS score_unit,
         |    CAST(event_type = 'purchase' AS BIGINT) AS pos
         |  FROM events WHERE value IS NOT NULL),
         |b AS (
         |  SELECT score_unit, CAST(sum(pos) AS BIGINT) AS n_pos,
         |    CAST(sum(1 - pos) AS BIGINT) AS n_neg
         |  FROM scored GROUP BY score_unit),
         |c AS (
         |  SELECT *, sum(n_pos) OVER (ORDER BY score_unit DESC
         |      ROWS UNBOUNDED PRECEDING) AS tp,
         |    sum(n_neg) OVER (ORDER BY score_unit DESC
         |      ROWS UNBOUNDED PRECEDING) AS fp
         |  FROM b),
         |t AS (SELECT CAST(sum(pos) AS BIGINT) AS p_total FROM scored)
         |SELECT score_unit, n_pos, n_neg, CAST(tp AS BIGINT) AS tp,
         |  CAST(fp AS BIGINT) AS fp, $prec AS precision_e6,
         |  $rec AS recall_e6
         |FROM c, t ORDER BY score_unit DESC""".stripMargin
    },
    "q323_mcnemar" -> {
      val stat = intDivExactSql(
        "CAST(abs(b - c) - 1 AS HUGEINT) * (abs(b - c) - 1) * 1000000",
        "b + c")
      s"""WITH s AS ($stumpsSql),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN pred_a = truth AND pred_b <> truth
         |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN pred_a <> truth AND pred_b = truth
         |      THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM s)
         |SELECT n, b, c,
         |  CASE WHEN b + c = 0 THEN NULL ELSE $stat END AS mcnemar_e6
         |FROM agg""".stripMargin
    },
    "q324_cohen_kappa" -> {
      val po = intDivExactSql(
        "CAST(agree AS HUGEINT) * 2000000 + n", "2 * n")
      val kap = intDivExactSql(
        "(CAST(agree AS HUGEINT) * n - CAST(r1 AS HUGEINT) * c1 - " +
          "CAST(n - r1 AS HUGEINT) * (n - c1)) * 1000000",
        "CAST(n AS HUGEINT) * n - CAST(r1 AS HUGEINT) * c1 - " +
          "CAST(n - r1 AS HUGEINT) * (n - c1)")
      s"""WITH s AS ($stumpsSql),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN pred_a = pred_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS agree,
         |    CAST(sum(pred_a) AS BIGINT) AS r1,
         |    CAST(sum(pred_b) AS BIGINT) AS c1
         |  FROM s)
         |SELECT n, agree, $po AS p_o_e6, $kap AS kappa_e6
         |FROM agg""".stripMargin
    })
}
