package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Rounding.{cents, roundf, sumExact}

/** Join / sort / limit / grouping-set breadth (SURVEY.md §7 phase C).
  *
  * The reference itself has no joins (SURVEY §2.3); these exercise the full
  * `Dataset.join` surface the engine inherits, shaped like TPC-H so the
  * plans are the classic ones: dimension sides explicitly `broadcast()`,
  * fact-fact joins left to sort-merge + AQE.
  */
object JoinQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** TPC-H Q3 shape: broadcast dim filter + fact join + agg + top-k.
    * customer is tiny at every SF relative to lineitem → broadcast. */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(roundf(sumExact(cents(col("l_extendedprice")) *
        cents(lit(1) - col("l_discount"))) / 10000.0, 2)
        .as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: snowflake of broadcast dims + co-located fact joins,
    * revenue per nation. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supplier = t(s, dir, "supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(roundf(sumExact(cents(col("l_extendedprice")) *
        cents(lit(1) - col("l_discount"))) / 10000.0, 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Left-semi join (EXISTS): customers that placed at least one order. */
  private def q13(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
        "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  /** Left-anti join (NOT EXISTS): customers with no orders. */
  private def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-outer join + agg preserving zero-order customers. */
  private def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
        "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        roundf(coalesce(sumExact(cents(col("o_totalprice"))),
          lit(0.0)) / 100.0, 2).as("total_spent"))
      .orderBy("c_custkey")

  /** Global sort + limit (top-k by price). TakeOrderedAndProject physically —
    * no full global sort materialization. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** Ranking window functions per group: rank / dense_rank / ntile. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("c_mktsegment", "rnk")
  }

  /** ROLLUP grouping sets (subtotals + grand total); grouping-null keys
    * coalesced to 'ALL' so both engines agree on the marker. */
  private def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), roundf(sumExact(cents(col("l_quantity"))) / 100.0, 2)
        .as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Scalar-subquery shape: orders above the global average price. The
    * single-row aggregate is broadcast — no driver collect, no global
    * window. */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders").select("o_orderkey", "o_totalprice")
    val avgRow = ord.agg(avg("o_totalprice").as("avg_price"))
    ord.crossJoin(broadcast(avgRow))
      .filter(col("o_totalprice") > col("avg_price"))
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** String scalar functions over documents (SURVEY §2.7). */
  private def q20(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        upper(col("lang")).as("lang_u"),
        length(col("text")).cast("long").as("len"),
        substring(col("text"), 1, 10).as("prefix"),
        concat_ws("_", col("source"), col("lang")).as("src_lang"),
        col("text").startsWith("the").cast("int").as("starts_the"))
      .orderBy("doc_id")

  val defs: Map[String, Q] = Map(
    "q11_join_topk" -> (q11 _),
    "q12_join_snowflake" -> (q12 _),
    "q13_semi_join" -> (q13 _),
    "q14_anti_join" -> (q14 _),
    "q15_outer_join_agg" -> (q15 _),
    "q16_sort_limit" -> (q16 _),
    "q17_window_rank" -> (q17 _),
    "q18_rollup" -> (q18 _),
    "q19_above_avg" -> (q19 _),
    "q20_string_funcs" -> (q20 _))

  val oracle: Map[String, String] = Map(
    "q11_join_topk" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  floor((CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q12_join_snowflake" ->
      """SELECT n_name,
        |  floor((CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q13_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q15_outer_join_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  floor((coalesce(CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE), 0.0) / 100.0) * 100.0 + 0.5) / 100.0 AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q16_sort_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q17_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, rnk""".stripMargin,
    "q18_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_rows, floor((CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) * 100.0 + 0.5) / 100.0 AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q19_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q20_string_funcs" ->
      """SELECT doc_id, upper(lang) AS lang_u, length(text) AS len,
        |  substr(text, 1, 10) AS prefix,
        |  concat_ws('_', source, lang) AS src_lang,
        |  CAST(starts_with(text, 'the') AS INT) AS starts_the
        |FROM documents ORDER BY doc_id""".stripMargin)
}
