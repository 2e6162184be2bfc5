package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Rounding.{cents, roundf, sumExact}

/** Reference-parity dataflow operators (SURVEY.md §2.2/§2.4–§2.7) expressed
  * over the driver testdata tables.
  *
  * Each query keeps filters/projections as plain Catalyst expressions so
  * pushdown + whole-stage codegen apply, aliases every computed column
  * identically to its oracle SQL, rounds float aggregates (so DuckDB/Spark
  * summation-order ULP differences cannot flip the hash), and ends in a
  * deterministic ORDER BY.
  */
object CoreQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** §2 #17/#18: projection + filter; both reach the parquet scan
    * (PushedFilters + pruned ReadSchema). Reference: transform.py:63-64. */
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") > 30 &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** §2 #13/#14/#35: literal column, casts, scalar arithmetic.
    * Reference: stock_ingestor.py:31,33-35. */
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        col("event_id").cast("string").as("id_str"),
        floor(col("value")).as("value_floor"),
        lit("graft").as("tag"),
        (col("value") * 2).as("value2x"))
      .orderBy("event_id")

  /** §2 #15/#34: timestamp formatting + string→timestamp parse round-trip
    * (null-on-failure parse per transform.py:47 intended semantics). */
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("ts_hour"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
          "yyyy-MM-dd HH:mm:ss").isNotNull.cast("int").as("parsed_ok"))
      .orderBy("event_id")

  /** §2 #22: UNION ALL, schema aligned by name (combine_processed.py:20). */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.filter(col("event_type") === "purchase")
      .unionByName(ev.filter(col("event_type") === "signup"))
      .orderBy("event_id")
  }

  /** §2 #23: distinct values (stock_predictor.py:50). */
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select("event_type").distinct().orderBy("event_type")

  /** §2 #24/#26/#27: hash aggregation with partial (map-side) combine —
    * TPC-H Q1 shape. One shuffle on the two group keys.
    *
    * Money columns are exact hundredths, so every sum runs in fixed-point
    * (order-independent, overflow-safe — see Rounding.cents/sumExact) and
    * converts to double once at the end; averages divide the exact sum by
    * the count. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val qty = sumExact(cents(col("l_quantity"))) / 100.0
    val price = sumExact(cents(col("l_extendedprice"))) / 100.0
    val disc = sumExact(cents(col("l_extendedprice")) *
      cents(lit(1) - col("l_discount"))) / 10000.0
    val charge = sumExact(cents(col("l_extendedprice")) *
      cents(lit(1) - col("l_discount")) *
      cents(lit(1) + col("l_tax"))) / 1000000.0
    val n = count(lit(1)).cast("double")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        roundf(qty, 2).as("sum_qty"),
        roundf(price, 2).as("sum_base_price"),
        roundf(disc, 2).as("sum_disc_price"),
        roundf(charge, 2).as("sum_charge"),
        roundf(qty / n, 4).as("avg_qty"),
        roundf(price / n, 4).as("avg_price"),
        roundf(sumExact(cents(col("l_discount"))) / 100.0 / n, 4)
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** §2 #3/#8/#25/#30: latest-row-per-key ("latest file wins" re-expressed as
    * a window top-1; transform.py:11-24, stock_predictor.py:26). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** §2 #28/#29: the reference's one true window function — lead/shift(-1)
    * per group in time order (stock_predictor.py:73), plus lag. */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .select(
        col("user_id"), col("event_id"), col("value"),
        lead("value", 1).over(w).as("next_value"),
        lag("value", 1).over(w).as("prev_value"))
      .orderBy("user_id", "event_id")
  }

  /** §2 #19/#20: drop-nulls on the lead target + round
    * (stock_predictor.py:74,92). */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("next_value", lead("value", 1).over(w))
      .na.drop(Seq("next_value"))
      .select(col("user_id"), col("event_id"),
        roundf(col("next_value") - col("value"), 2).as("delta"))
      .orderBy("user_id", "event_id")
  }

  /** §2 #36: JSON value extraction from the `props` string column. Done with
    * regexp (codegen'd) so the oracle shares byte-identical semantics. */
  private def q21(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
      .orderBy("event_id")

  /** JSON-extracted value aggregated per type (long sum). */
  private def q22(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Hourly tumbling bucket — the batch twin of the Structured Streaming
    * windowed aggregation in graft.streaming (SURVEY §2.8 extension). */
  private def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        roundf(sumExact(cents(col("value"))) / 100.0, 2)
          .as("sum_value"))
      .select(date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  val defs: Map[String, Q] = Map(
    "q01_project_filter" -> (q01 _),
    "q02_scalar_cast" -> (q02 _),
    "q03_ts_roundtrip" -> (q03 _),
    "q04_union_all" -> (q04 _),
    "q05_distinct" -> (q05 _),
    "q06_groupby_agg" -> (q06 _),
    "q07_latest_per_key" -> (q07 _),
    "q08_lead_lag" -> (q08 _),
    "q09_dropna_round" -> (q09 _),
    "q21_json_extract" -> (q21 _),
    "q22_json_agg" -> (q22 _),
    "q23_hourly_bucket" -> (q23 _))

  val oracle: Map[String, String] = Map(
    "q01_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 30 AND l_shipdate < TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_scalar_cast" ->
      """SELECT event_id, CAST(event_id AS VARCHAR) AS id_str,
        |  CAST(floor(value) AS BIGINT) AS value_floor,
        |  'graft' AS tag, value * 2 AS value2x
        |FROM events ORDER BY event_id""".stripMargin,
    "q03_ts_roundtrip" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ts_hour,
        |  CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
        |       '%Y-%m-%d %H:%M:%S') IS NOT NULL AS INT) AS parsed_ok
        |FROM events ORDER BY event_id""".stripMargin,
    "q04_union_all" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type = 'signup'
        |ORDER BY event_id""".stripMargin,
    "q05_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q06_groupby_agg" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS pc,
        |    CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT) AS dc,
        |    CAST(floor((1 + l_tax) * 100.0 + 0.5) AS BIGINT) AS tc,
        |    CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS ddc
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01')
        |SELECT l_returnflag, l_linestatus,
        |  floor((CAST(sum(qc) AS DOUBLE) / 100.0) * 100.0 + 0.5) / 100.0 AS sum_qty,
        |  floor((CAST(sum(pc) AS DOUBLE) / 100.0) * 100.0 + 0.5) / 100.0 AS sum_base_price,
        |  floor((CAST(sum(pc * dc) AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
        |  floor((CAST(sum(pc * dc * tc) AS DOUBLE) / 1000000.0) * 100.0 + 0.5) / 100.0 AS sum_charge,
        |  floor(((CAST(sum(qc) AS DOUBLE) / 100.0) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  floor(((CAST(sum(pc) AS DOUBLE) / 100.0) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  floor(((CAST(sum(ddc) AS DOUBLE) / 100.0) / CAST(count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM c
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q07_latest_per_key" ->
      """WITH ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS last_event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  value AS last_value
        |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q08_lead_lag" ->
      """SELECT user_id, event_id, value,
        |  lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
        |  lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q09_dropna_round" ->
      """WITH w AS (
        |  SELECT user_id, event_id, value,
        |    lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        |  FROM events)
        |SELECT user_id, event_id, floor((next_value - value) * 100.0 + 0.5) / 100.0 AS delta
        |FROM w WHERE next_value IS NOT NULL
        |ORDER BY user_id, event_id""".stripMargin,
    "q21_json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q22_json_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q23_hourly_bucket" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  event_type, count(*) AS n,
        |  floor((CAST(sum(CAST(floor("value" * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) * 100.0 + 0.5) / 100.0 AS sum_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin)
}
