package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Rounding.{cents, roundf, sumExact}

/** Classic multi-join analytical shapes (TPC-H Q7/Q8/Q2 style) over the
  * testdata star schema — the join-heavy breadth the reference itself never
  * exercises (SURVEY.md §2.3: the reference has no joins at all).
  *
  * 100 TB posture: `lineitem`/`orders` are the fact tables and every
  * dimension (nation, region, supplier, customer at TPC-H proportions) is
  * broadcast-joined, so each query is one or two fact-fact shuffles on the
  * join keys plus a small aggregate; AQE handles the rest.
  */
object TpchQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Volume in exact 10⁻⁴ fixed-point (int64): order-independent sums —
    * see Rounding.cents. */
  private def vol4 = cents(col("l_extendedprice")) *
    cents(lit(1) - col("l_discount"))

  /** Q7-style volume shipping: revenue between every ordered pair of
    * distinct (supplier nation → customer nation), per ship year. */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"), vol4.as("vol"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(roundf(sumExact(col("vol")) / 10000.0, 2).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8-style market share: among orders from customers in region ASIA,
    * the share of line-item volume supplied by NATION_2, per order year. */
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val asiaCust = t(s, dir, "customer")
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
      .select("c_custkey")
    val suppNation = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name"))),
        col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = t(s, dir, "orders")
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), vol4.as("vol"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(roundf(
        sumExact(when(col("supp_nation") === "NATION_2", col("vol"))
          .otherwise(lit(0L))) /
          sumExact(col("vol")), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q2-style min-per-group + join-back: for every part, the supplier(s)
    * with the minimum total sale revenue for that part (ties kept, like
    * Q2's multi-row answer per part). */
  private def q59(s: SparkSession, dir: String): DataFrame = {
    val ps = t(s, dir, "lineitem")
      .groupBy("l_partkey", "l_suppkey")
      .agg(roundf(sumExact(vol4) / 10000.0, 2).as("rev"))
    val minRev = ps.groupBy("l_partkey")
      .agg(min("rev").as("min_rev"))
    ps.join(minRev, Seq("l_partkey"))
      .filter(col("rev") === col("min_rev"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_key"), col("l_suppkey").as("s_key"),
        col("s_name"), col("rev"))
      .orderBy("p_key", "s_key")
  }

  /** Pure range join — NO equi key: line items counted into calendar-month
    * windows derived from order dates. Runs through RangeJoin.binned
    * (32-day bins over epoch-micros), which turns what Spark would plan as
    * a nested-loop theta join into an equi-join on bin ids — the shape
    * that survives 100 TB. The DuckDB oracle states the same join as a
    * plain range predicate. */
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val months = t(s, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).as("month_start"))
      .distinct()
      .select(col("month_start"),
        // .cast("timestamp") first: parquet may surface these as
        // TIMESTAMP_NTZ (session-dependent inference), which unix_micros
        // rejects; under the engine's pinned UTC session the cast is a
        // same-instant no-op
        unix_micros(col("month_start").cast("timestamp")).as("lo"),
        unix_micros((col("month_start") + expr("INTERVAL 1 MONTH"))
          .cast("timestamp")).as("hi"))
    val li = t(s, dir, "lineitem")
      .select(unix_micros(col("l_shipdate").cast("timestamp")).as("p"),
        vol4.as("vol"))
    graft.operators.RangeJoin
      .binned(li, months, "p", "lo", "hi", 32L * 24 * 3600 * 1000000)
      .groupBy("month_start")
      .agg(count(lit(1)).as("n_items"),
        roundf(sumExact(col("vol")) / 10000.0, 2).as("revenue"))
      .select(date_format(col("month_start"), "yyyy-MM-dd").as("month_start"),
        col("n_items"), col("revenue"))
      .orderBy("month_start")
  }

  /** Q3-style shipping priority: top-10 orders by open revenue — BUILDING
    * segment, ordered before / shipped after the cutoff. Two broadcast
    * dims + one fact-fact shuffle, top-k via TakeOrderedAndProject;
    * revenue stays exact 10⁻⁴ fixed-point all the way out (BIGINT, no
    * doubles in the compare), and the (revenue DESC, orderkey) sort is
    * fully deterministic. */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-01"
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < to_timestamp(lit(cutoff)))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") > to_timestamp(lit(cutoff)))
      .select(col("l_orderkey"), vol4.as("vol"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(col("vol").cast("decimal(38,0)")).cast("long")
        .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Market-basket pair mining: parts co-purchased in the same order at
    * least twice across the corpus (the candidate-generation step of
    * frequent-itemset mining, and the co-occurrence statistic behind
    * item-item recommenders). ONE scan: each basket's distinct items
    * collect to a sorted array (buffer O(basket), not O(basket²)), a
    * basket-size cap (≤ 8 distinct parts) bounds pair fan-out at
    * C(8,2)=28 — the same df-cap discipline as q41's shingle join, so a
    * pathological mega-basket cannot quadratically explode a reducer —
    * and ordered pairs expand via codegen'd array lambdas (p1 < p2 by
    * construction from the sorted array). No self-join: the keyed
    * self-join formulation scans the fact twice and pays two window
    * passes; this shape is groupBy → explode → groupBy, two exchanges
    * total before the presentation sort. The support threshold (≥ 2)
    * prunes the output before that sort. */
  private def q128(s: SparkSession, dir: String): DataFrame =
    graft.operators.CoOccur
      .pairs(Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
        maxBasket = 8, minSupport = 2)
      .select(col("item_a").as("p1"), col("item_b").as("p2"),
        col("n_baskets").as("n_orders"))
      .orderBy("p1", "p2")

  /** Order-to-ship latency census per ship month — the fulfillment-SLA
    * dashboard (TPC-H Q12's domain, adapted to the synthetic schema's
    * one date pair): transit time o_orderdate→l_shipdate per item, with
    * the slow-fulfillment flag at > 90 days. One fact-fact equi-join on
    * the order key (both sides shuffle — correct at 100 TB; nothing
    * here is broadcastable) and one aggregation; the mean is left to
    * the consumer as the exact integer pair (sum_latency_days,
    * n_items) — the q112 discipline — and the sum accumulates through
    * decimal(38,0) so a 100 TB month cannot wrap int64. */
  private def q143(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM-dd")
          .as("ship_month"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("latency_days"))
      .groupBy("ship_month")
      .agg(count(lit(1)).as("n_items"),
        sum((col("latency_days") > 90).cast("long")).cast("long")
          .as("n_slow"),
        sum(col("latency_days").cast("decimal(38,0)")).cast("long")
          .as("sum_latency_days"),
        max("latency_days").as("max_latency_days"))
      .orderBy("ship_month")

  /** TPC-H Q5 (local supplier volume): revenue from orders where the
    * customer and the line's supplier sit in the SAME nation of one
    * region, per nation, one order-date year. The canonical 6-table
    * join-planning benchmark: lineitem⋈orders is the one fact-fact
    * shuffle; supplier/customer key-columns and nation/region broadcast
    * (at TPC-H proportions — see the pack scaladoc); the same-nation
    * predicate is applied as soon as both nation keys exist so mismatched
    * rows never reach the aggregate. Revenue is the exact e4 fixed-point
    * BIGINT (q93 discipline — integer outputs cannot ulp-diverge). */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val asiaNationKeys = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")
        .filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select("o_orderkey", "o_custkey")
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), vol4.as("vol"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNationKeys),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("vol").cast("decimal(38,0)")).cast("long")
        .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("nation"))
  }

  /** TPC-H Q10 (returned-item reporting): the top-20 customers by revenue
    * lost to returns in one quarter. One fact-fact shuffle
    * (lineitem⋈orders, both pre-filtered so the exchange carries only the
    * quarter's returned rows), customer/nation broadcast, then a top-k —
    * at 100 TB the ORDER BY+LIMIT is a TakeOrderedAndProject: each task
    * keeps 20 rows, no global sort. Ties broken by c_custkey so the row
    * set is deterministic; acctbal emitted as exact cents. */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-04-01")))
      .select("o_orderkey", "o_custkey")
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_cents"), col("c_nationkey"))
    val nat = t(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name").as("nation"))
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), vol4.as("vol"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "acctbal_cents", "nation")
      .agg(sum(col("vol").cast("decimal(38,0)")).cast("long")
        .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
  }

  val defs: Map[String, Q] = Map(
    "q57_volume_shipping" -> (q57 _),
    "q145_local_supplier_volume" -> (q145 _),
    "q146_returned_items" -> (q146 _),
    "q58_market_share" -> (q58 _),
    "q59_min_cost_supplier" -> (q59 _),
    "q65_range_join_binned" -> (q65 _),
    "q93_shipping_priority" -> (q93 _),
    "q128_cooccur" -> (q128 _),
    "q143_shipping_latency" -> (q143 _))

  val oracle: Map[String, String] = Map(
    "q145_local_supplier_volume" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
        |    CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)
        |    AS DECIMAL(38,0))) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY 1
        |ORDER BY revenue_e4 DESC, nation""".stripMargin,
    "q146_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents,
        |  n_name AS nation,
        |  CAST(sum(CAST(
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
        |    CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)
        |    AS DECIMAL(38,0))) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-04-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin,
    "q57_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  floor((CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q93_shipping_priority" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) *
        |    CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)
        |    AS DECIMAL(38,0))) AS BIGINT) AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "q58_market_share" ->
      """WITH asia_cust AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |vols AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT) AS vol,
        |    n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN asia_cust ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey)
        |SELECT o_year,
        |  floor((CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol ELSE 0 END) AS DOUBLE)
        |         / CAST(sum(vol) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
        |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q59_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey,
        |    l_suppkey,
        |    floor((CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0 AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (SELECT l_partkey, min(rev) AS min_rev FROM ps GROUP BY 1)
        |SELECT ps.l_partkey AS p_key, ps.l_suppkey AS s_key, s_name, rev
        |FROM ps
        |JOIN m ON ps.l_partkey = m.l_partkey AND ps.rev = m.min_rev
        |JOIN supplier ON ps.l_suppkey = s_suppkey
        |ORDER BY p_key, s_key""".stripMargin,
    "q65_range_join_binned" ->
      """WITH months AS (
        |  SELECT DISTINCT date_trunc('month', o_orderdate) AS month_start,
        |    date_trunc('month', o_orderdate) + INTERVAL 1 MONTH AS month_end
        |  FROM orders)
        |SELECT strftime(month_start, '%Y-%m-%d') AS month_start,
        |  count(*) AS n_items,
        |  floor((CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
        |FROM lineitem JOIN months
        |  ON l_shipdate >= month_start AND l_shipdate < month_end
        |GROUP BY months.month_start
        |ORDER BY month_start""".stripMargin,
    "q128_cooccur" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |capped AS (
        |  SELECT l_orderkey, l_partkey FROM (
        |    SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS bsize
        |    FROM items)
        |  WHERE bsize <= 8)
        |SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
        |FROM capped a JOIN capped b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY 1, 2""".stripMargin,
    "q143_shipping_latency" ->
      """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d')
        |    AS ship_month,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(date_diff('day', o_orderdate, l_shipdate) > 90
        |    AS BIGINT)) AS BIGINT) AS n_slow,
        |  CAST(sum(CAST(date_diff('day', o_orderdate, l_shipdate)
        |    AS DECIMAL(38,0))) AS BIGINT) AS sum_latency_days,
        |  CAST(max(date_diff('day', o_orderdate, l_shipdate))
        |    AS BIGINT) AS max_latency_days
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
