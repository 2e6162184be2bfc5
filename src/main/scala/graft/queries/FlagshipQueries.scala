package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Rounding.roundf

/** The flagship query: the reference's predictor contract
  * (`scripts/stock_predictor.py:38-102`, SURVEY.md §2 rows 38-40) re-expressed
  * as pure distributed aggregation over the `events` table
  * (user_id ⇢ symbol, ts ⇢ Datetime, value ⇢ Close).
  *
  * Per group: target = next value in time order (lead), fit OLS
  * `target ~ value` in closed form via `regr_slope`/`regr_intercept`
  * (standard SQL population formulas — no per-group collect, no driver
  * loop), predict one step ahead from the last row, report in-sample MSE.
  * Output contract mirrors the reference: one row per group with
  * (user_id, predicted_value round 2, last_date string, mse round 4).
  *
  * 100 TB posture: two shuffles on `user_id` (window + aggregate) and a
  * broadcast join of the per-group coefficients (|groups| rows — tiny) back
  * onto the cleaned pairs for the residual pass. Nothing is collected to the
  * driver; group count can grow unboundedly.
  */
object FlagshipQueries extends QueryPack {

  def olsNextValue(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val clean = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("target", lead("value", 1).over(w))
      .filter(col("target").isNotNull)

    // One aggregation pass gets coefficients AND the last row's features:
    // max_by keyed on (ts, event_id) replaces a second window + join.
    // min-rows guard per stock_predictor.py:76-77 (len >= 2).
    val ord = struct(col("ts"), col("event_id"))
    val coef = clean.groupBy("user_id")
      .agg(
        expr("regr_slope(target, value)").as("slope"),
        expr("regr_intercept(target, value)").as("icept"),
        max_by(col("value"), ord).as("last_value"),
        max_by(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), ord)
          .as("last_date"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .drop("n")

    val mse = clean.join(broadcast(coef), Seq("user_id"))
      .groupBy("user_id")
      .agg(avg(pow(col("target") - (col("icept") + col("slope") * col("value")), 2))
        .as("mse_raw"))

    coef
      .join(broadcast(mse), Seq("user_id"))
      .select(
        col("user_id"),
        roundf(col("icept") + col("slope") * col("last_value"), 2)
          .as("predicted_value"),
        col("last_date"),
        roundf(col("mse_raw"), 4).as("mse"))
      .orderBy("user_id")
  }

  /** Split-conformal band for the flagship forecast — the calibrated
    * uncertainty the reference's predictor never ships (its MSE is a
    * training-set average, not a guarantee): the 90th percentile of
    * each user's absolute in-sample residuals IS the half-width h such
    * that, under exchangeability, the next observation lands in
    * prediction ± h with ~90% coverage — distribution-free, no
    * normality assumed (the q283 philosophy applied to a model).
    * Residuals round to integer cents BEFORE the percentile (floor
    * form), so the quantile interpolates the q142-proven construct
    * (Spark `percentile` ≡ DuckDB `quantile_cont` on BIGINTs), and the
    * e1 scaling re-lands it on an integer. Same one-pass regr_* fit as
    * q10; the residual pass is the q10 MSE join reused. */
  private def q289(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val clean = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("target", lead("value", 1).over(w))
      .filter(col("target").isNotNull)
    val coef = clean.groupBy("user_id")
      .agg(expr("regr_slope(target, value)").as("slope"),
        expr("regr_intercept(target, value)").as("icept"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2).drop("n")
    clean.join(broadcast(coef), Seq("user_id"))
      .withColumn("rc",
        floor(abs(col("target") -
          (col("icept") + col("slope") * col("value"))) * lit(100.0) +
          lit(0.5)).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_obs"),
        floor(expr("percentile(rc, 0.9)") * lit(10.0) + lit(0.5))
          .cast("long").as("band_cents_e1"))
      .orderBy("user_id")
  }

  /** 5-fold cross-validated OLS — the generalization gap the flagship's
    * in-sample MSE (q10) hides: folds from the md5 coin on event_id,
    * each fold scored by a model trained on the OTHER four. The trick
    * that makes it ONE aggregation pass instead of five: train-fold
    * power sums are total-minus-fold INTEGER subtraction — (x, y) live
    * on the exact cents grid, so Σx, Σy, Σxy, Σx² per (user, fold) are
    * exact decimals and every complement is exact. Coefficients then
    * form as two exact integer rationals (bNum/den, and a from the
    * normal equation), convert ONCE to double (round-to-nearest of the
    * same integers in both engines), and the per-row residual chain is
    * fixed textual arithmetic — so the per-row e2 floor is bit-agreed
    * and the fold SSE is an EXACT integer, unlike q10's order-sensitive
    * avg(pow(...)). test_mse_e4c2 is the half-up exact rational in
    * (10⁻² cents)² units. Degenerate folds (n_train < 2 or constant x)
    * are filtered, explicitly. */
  private def q311(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.{cents, intDivExact}
    import graft.functions.Hashing
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val clean = Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("target", lead("value", 1).over(w))
      .filter(col("target").isNotNull)
      .select(col("user_id"),
        (Hashing.md5U32(col("event_id").cast("string")) % 5L).as("fold"),
        cents(col("value")).as("x"), cents(col("target")).as("y"))
    def d(c: String) = col(c).cast("decimal(38,0)")
    val perFold = clean.groupBy("user_id", "fold")
      .agg(count(lit(1)).as("n_f"),
        sum(d("x")).as("sx_f"), sum(d("y")).as("sy_f"),
        sum(d("x") * col("y")).as("sxy_f"),
        sum(d("x") * col("x")).as("sxx_f"))
    val tot = perFold.groupBy("user_id")
      .agg(sum("n_f").as("n_t"), sum("sx_f").as("sx_t"),
        sum("sy_f").as("sy_t"), sum("sxy_f").as("sxy_t"),
        sum("sxx_f").as("sxx_t"))
    val coef = perFold.join(tot, "user_id")
      .select(col("user_id"), col("fold"),
        (col("n_t") - col("n_f")).as("n"),
        (col("sx_t") - col("sx_f")).as("sx"),
        (col("sy_t") - col("sy_f")).as("sy"),
        (col("sxy_t") - col("sxy_f")).as("sxy"),
        (col("sxx_t") - col("sxx_f")).as("sxx"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("bnum", col("n") * col("sxy") - col("sx") * col("sy"))
      .filter(col("n") >= 2L && col("den") > 0)
      .withColumn("b", col("bnum").cast("double") / col("den").cast("double"))
      .withColumn("a",
        (col("sy").cast("double") - col("b") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select(col("user_id"), col("fold"), col("n").cast("long").as("n_train"),
        col("a"), col("b"))
    clean.join(coef, Seq("user_id", "fold"))
      .withColumn("rc_e2",
        floor((col("y").cast("double") -
          (col("a") + col("b") * col("x").cast("double"))) * lit(100.0) +
          lit(0.5)).cast("long"))
      .groupBy("user_id", "fold")
      .agg(first("n_train").as("n_train"), count(lit(1)).as("n_test"),
        sum((col("rc_e2").cast("decimal(38,0)") * col("rc_e2")))
          .cast("long").as("sse_e4c2"))
      .withColumn("test_mse_e4c2", intDivExact(
        col("sse_e4c2").cast("decimal(38,0)") * lit(2L) + col("n_test"),
        lit(2L) * col("n_test")))
      .orderBy("user_id", "fold")
  }

  val defs: Map[String, Q] = Map(
    "q10_flagship_ols" -> (olsNextValue _),
    "q311_cv_ols" -> (q311 _),
    "q289_conformal_band" -> (q289 _))

  val oracle: Map[String, String] = Map(
    // same coin folds, HUGEINT complement sums, the identical
    // int→double→residual chain, exact integer SSE
    "q311_cv_ols" -> {
      val coin = graft.functions.Hashing
        .md5U32Sql("CAST(event_id AS VARCHAR)")
      val cx = graft.functions.Rounding.centsSql("value")
      val cy = graft.functions.Rounding.centsSql("target")
      s"""WITH pairs AS (
        |  SELECT user_id, event_id, value,
        |    lead(value) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS target
        |  FROM events QUALIFY target IS NOT NULL),
        |clean AS (
        |  SELECT user_id, $coin % 5 AS fold, $cx AS x, $cy AS y
        |  FROM pairs),
        |pf AS (
        |  SELECT user_id, fold, count(*) AS n_f,
        |    sum(CAST(x AS HUGEINT)) AS sx_f,
        |    sum(CAST(y AS HUGEINT)) AS sy_f,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy_f,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx_f
        |  FROM clean GROUP BY 1, 2),
        |tt AS (
        |  SELECT user_id, sum(n_f) AS n_t, sum(sx_f) AS sx_t,
        |    sum(sy_f) AS sy_t, sum(sxy_f) AS sxy_t, sum(sxx_f) AS sxx_t
        |  FROM pf GROUP BY 1),
        |tr AS (
        |  SELECT pf.user_id, fold, n_t - n_f AS n, sx_t - sx_f AS sx,
        |    sy_t - sy_f AS sy, sxy_t - sxy_f AS sxy, sxx_t - sxx_f AS sxx
        |  FROM pf JOIN tt ON pf.user_id = tt.user_id),
        |cf AS (
        |  SELECT user_id, fold, CAST(n AS BIGINT) AS n_train,
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
        |    sx, sy, n
        |  FROM tr WHERE n >= 2 AND n * sxx - sx * sx > 0),
        |cf2 AS (
        |  SELECT user_id, fold, n_train, b,
        |    (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS a
        |  FROM cf),
        |sc AS (
        |  SELECT c.user_id, c.fold, n_train,
        |    CAST(floor((CAST(y AS DOUBLE)
        |      - (a + b * CAST(x AS DOUBLE))) * 100.0 + 0.5) AS BIGINT)
        |      AS rc
        |  FROM clean c JOIN cf2
        |    ON c.user_id = cf2.user_id AND c.fold = cf2.fold),
        |agg AS (
        |  SELECT user_id, fold, min(n_train) AS n_train,
        |    count(*) AS n_test,
        |    CAST(sum(CAST(rc AS HUGEINT) * rc) AS BIGINT) AS sse_e4c2
        |  FROM sc GROUP BY 1, 2)
        |SELECT user_id, fold, n_train, n_test, sse_e4c2,
        |  CAST((CAST(sse_e4c2 AS HUGEINT) * 2 + n_test)
        |    // (2 * n_test) AS BIGINT) AS test_mse_e4c2
        |FROM agg ORDER BY user_id, fold""".stripMargin
    },
    // same regr_* fit, same cents-rounded residuals, quantile_cont ≡
    // percentile on BIGINTs (q142's construct), same e1 landing
    "q289_conformal_band" ->
      """WITH clean AS (
        |  SELECT user_id, ts, event_id, value,
        |    lead(value) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS target
        |  FROM events QUALIFY target IS NOT NULL),
        |coef AS (
        |  SELECT user_id, regr_slope(target, value) AS slope,
        |    regr_intercept(target, value) AS icept
        |  FROM clean GROUP BY user_id HAVING count(*) >= 2),
        |r AS (
        |  SELECT c.user_id,
        |    CAST(floor(abs(target - (icept + slope * value)) * 100.0
        |      + 0.5) AS BIGINT) AS rc
        |  FROM clean c JOIN coef ON c.user_id = coef.user_id)
        |SELECT user_id, count(*) AS n_obs,
        |  CAST(floor(quantile_cont(rc, 0.9) * 10.0 + 0.5) AS BIGINT)
        |    AS band_cents_e1
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q10_flagship_ols" ->
      """WITH pairs AS (
        |  SELECT user_id, ts, event_id, value,
        |    lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS target
        |  FROM events),
        |clean AS (SELECT * FROM pairs WHERE target IS NOT NULL),
        |coef AS (
        |  SELECT user_id, regr_slope(target, value) AS slope,
        |         regr_intercept(target, value) AS icept
        |  FROM clean GROUP BY user_id HAVING count(*) >= 2),
        |lastrow AS (
        |  SELECT user_id, value AS last_value,
        |         strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_date
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM clean)
        |  WHERE rn = 1),
        |err AS (
        |  SELECT cl.user_id, avg(power(cl.target - (c.icept + c.slope * cl.value), 2)) AS mse_raw
        |  FROM clean cl JOIN coef c ON cl.user_id = c.user_id
        |  GROUP BY cl.user_id)
        |SELECT c.user_id, floor((c.icept + c.slope * l.last_value) * 100.0 + 0.5) / 100.0 AS predicted_value,
        |       l.last_date, floor((e.mse_raw) * 10000.0 + 0.5) / 10000.0 AS mse
        |FROM coef c
        |JOIN lastrow l ON c.user_id = l.user_id
        |JOIN err e ON c.user_id = e.user_id
        |ORDER BY c.user_id""".stripMargin)
}
