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
  private def q338(s: SparkSession, dir: String): DataFrame = {
    import Rounding.intDivExact
    val flags = Tables.load(s, dir, "documents")
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

  val defs: Map[String, Q] = Map(
    "q322_pr_curve" -> (q322 _),
    "q323_mcnemar" -> (q323 _),
    "q324_cohen_kappa" -> (q324 _),
    "q338_filter_agreement" -> (q338 _))

  val oracle: Map[String, String] = Map(
    // same three flags, one aggregation, same exact pair rationals
    "q338_filter_agreement" -> {
      val jac = (both: String, either: String) => intDivExactSql(
        s"CAST($both AS HUGEINT) * 20000 + ($either)", s"2 * ($either)")
      val agr = (nx: String, ny: String, both: String) => intDivExactSql(
        s"CAST(n - $nx - $ny + 2 * $both AS HUGEINT) * 20000 + n", "2 * n")
      s"""WITH flags AS (
        |  SELECT CAST(length(text) >= 300 AS BIGINT) AS a,
        |    CAST(CASE WHEN length(text) < 8 THEN 0 ELSE
        |      (len(list_distinct([substr(text, i, 8)
        |         for i in range(1, greatest(length(text) - 6, 1))]))
        |       * 20000 + (length(text) - 7))
        |      // (2 * (length(text) - 7)) END >= 9800 AS BIGINT) AS b,
        |    CAST(len(regexp_extract_all(text, '\\S+')) >= 60 AS BIGINT)
        |      AS c
        |  FROM documents),
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
