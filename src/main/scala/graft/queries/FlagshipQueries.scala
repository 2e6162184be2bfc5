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

  val defs: Map[String, Q] = Map(
    "q10_flagship_ols" -> (olsNextValue _),
    "q289_conformal_band" -> (q289 _))

  val oracle: Map[String, String] = Map(
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
