package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Rounding.roundf
import graft.functions.TextAnalysis.tokensCol

/** Generator / lateral and set-operation breadth: explode (flatten), word
  * count over exploded tokens, positional explode over vectors, and
  * INTERSECT / EXCEPT. */
object ArrayQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** The iconic distributed query: word count over exploded tokens,
    * top 20. */
  private def q37(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(tokensCol(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(20)

  /** Set operations with DISTINCT semantics: users that both purchased and
    * errored (INTERSECT), and users that purchased but never errored
    * (EXCEPT). */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchasers = ev.filter(col("event_type") === "purchase")
      .select("user_id")
    val erroring = ev.filter(col("event_type") === "error").select("user_id")
    purchasers.intersect(erroring)
      .withColumn("relation", lit("both"))
      .unionByName(purchasers.except(erroring)
        .withColumn("relation", lit("purchase_only")))
      .orderBy("relation", "user_id")
  }

  /** Positional explode over the vector column (first three components). */
  private def q53(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(slice(
          expr("transform(embedding, x -> cast(x AS double))"), 1, 3)))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
        roundf(col("col"), 6).as("comp"))
      .orderBy("vec_id", "pos")

  /** Equi + range (interval) join: line items shipped within 30 days of
    * their order's date. The equi key carries the join; the range predicate
    * filters post-match — the standard Spark shape for bounded-interval
    * joins (no cartesian range explosion). */
  private def q49(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate")
      // timestamp + INTERVAL (not date_add, which truncates to DATE) so the
      // range bound matches the oracle even for non-midnight order dates
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_fast_items"))
      .orderBy("o_orderkey")
  }

  /** String scalar-function sweep over the engine-shared surface. */
  private def q54(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        lpad(col("lang"), 5, "_").as("lang_pad"),
        rpad(col("source"), 8, ".").as("src_pad"),
        reverse(substring(col("text"), 1, 12)).as("rev12"),
        repeat(col("lang"), 3).as("lang3"),
        regexp_replace(substring(col("text"), 1, 20), "a", "@").as("swapped"),
        col("text").contains("spark").cast("int").as("has_spark"),
        locate("data", col("text")).cast("long").as("data_pos"))
      .orderBy("doc_id")

  /** Math scalar-function sweep (deterministic per-row, no aggregation).
    * Transcendentals (ln/log10/exp/pow) round at 4 decimals, not 6: Spark
    * codegen uses StrictMath while DuckDB uses libm, which differ by an
    * ulp on some inputs — the coarser grid makes a boundary flip
    * astronomically unlikely. sqrt is IEEE-exact, so it keeps 6. */
  private def q55(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_quantity")).as("ceil_q"),
        roundf(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
        roundf(log(col("l_extendedprice")), 4).as("ln_p"),
        roundf(log10(col("l_extendedprice")), 4).as("log10_p"),
        roundf(exp(col("l_discount")), 4).as("exp_d"),
        roundf(pow(col("l_tax"), 2), 4).as("tax_sq"),
        signum(col("l_discount") - 0.05).cast("double").as("sign_d"),
        (col("l_orderkey") % 7).as("mod7"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Set operations with BAG (ALL) semantics — the multiset algebra
    * DISTINCT set ops silently destroy: INTERSECT ALL keeps each
    * (user, type) row min(multiplicity-in-a, multiplicity-in-b) times,
    * EXCEPT ALL subtracts multiplicities. The halves split on
    * event_id parity so both sides are large with heavy overlap and
    * real duplicate counts. Spark plans both as aggregate+join on the
    * row value (count-and-min / count-and-subtract), one shuffle each —
    * no sort, no product. */
  private def q153(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("event_id", "user_id", "event_type")
    val a = ev.filter(col("event_id") % 2 === 0)
      .select("user_id", "event_type")
    val b = ev.filter(col("event_id") % 2 === 1)
      .select("user_id", "event_type")
    a.intersectAll(b).withColumn("op", lit("both"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("even_surplus")))
      .orderBy("op", "user_id", "event_type")
  }

  /** Higher-order array-function breadth: transform / filter / aggregate
    * / forall / exists as codegen'd lambdas over per-document token-length
    * arrays — the zero-shuffle, zero-UDF way to run per-row collection
    * logic (the mapInPandas/UDF trap this engine avoids everywhere). All
    * outputs integral; DuckDB mirrors each lambda with list_transform /
    * list_filter / list_aggregate. */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val arr = transform(tokensCol(col("text")), t => length(t).cast("long"))
    t(s, dir, "documents")
      .select(col("doc_id"), arr.as("lens"))
      .select(col("doc_id"),
        size(col("lens")).cast("long").as("n_toks"),
        size(filter(col("lens"), x => x >= 5)).cast("long").as("n_long"),
        aggregate(col("lens"), lit(0L), (a, x) => a + x * x).as("sum_sq"),
        forall(col("lens"), x => x < 20).cast("long").as("all_short"),
        exists(col("lens"), x => x === 1).cast("long").as("any_one"))
      .orderBy("doc_id")
  }

  val defs: Map[String, Q] = Map(
    "q37_wordcount" -> (q37 _),
    "q38_set_ops" -> (q38 _),
    "q153_bag_set_ops" -> (q153 _),
    "q157_hof_breadth" -> (q157 _),
    "q49_range_join" -> (q49 _),
    "q53_explode_pos" -> (q53 _),
    "q54_string_breadth" -> (q54 _),
    "q55_math_breadth" -> (q55 _))

  val oracle: Map[String, String] = Map(
    "q37_wordcount" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents)
        |SELECT tok, count(*) AS n FROM toks WHERE tok <> ''
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,
    "q157_hof_breadth" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_transform(
        |      regexp_split_to_array(lower(trim(text)), '\s+'),
        |      x -> CAST(length(x) AS BIGINT)) AS lens
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(lens) AS BIGINT) AS n_toks,
        |  CAST(len(list_filter(lens, x -> x >= 5)) AS BIGINT) AS n_long,
        |  CAST(list_aggregate(list_transform(lens, x -> x * x), 'sum')
        |    AS BIGINT) AS sum_sq,
        |  CAST(len(list_filter(lens, x -> x >= 20)) = 0 AS BIGINT)
        |    AS all_short,
        |  CAST(len(list_filter(lens, x -> x = 1)) > 0 AS BIGINT)
        |    AS any_one
        |FROM d ORDER BY doc_id""".stripMargin,
    "q153_bag_set_ops" ->
      """WITH a AS (SELECT user_id, event_type FROM events
        |           WHERE event_id % 2 = 0),
        |b AS (SELECT user_id, event_type FROM events
        |      WHERE event_id % 2 = 1)
        |SELECT user_id, event_type, 'both' AS op
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT user_id, event_type, 'even_surplus' AS op
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |ORDER BY op, user_id, event_type""".stripMargin,
    "q38_set_ops" ->
      """SELECT user_id, 'both' AS relation FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |UNION ALL
        |SELECT user_id, 'purchase_only' AS relation FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |ORDER BY relation, user_id""".stripMargin,
    "q53_explode_pos" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT vec_id, v, unnest(generate_series(1, 3)) AS pos FROM e)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos, floor((v[pos]) * 1000000.0 + 0.5) / 1000000.0 AS comp
        |FROM p ORDER BY vec_id, pos""".stripMargin,
    "q49_range_join" ->
      """SELECT o_orderkey, count(*) AS n_fast_items
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q54_string_breadth" ->
      """SELECT doc_id,
        |  lpad(lang, 5, '_') AS lang_pad,
        |  rpad(source, 8, '.') AS src_pad,
        |  reverse(substr(text, 1, 12)) AS rev12,
        |  repeat(lang, 3) AS lang3,
        |  regexp_replace(substr(text, 1, 20), 'a', '@', 'g') AS swapped,
        |  CAST(contains(text, 'spark') AS INT) AS has_spark,
        |  strpos(text, 'data') AS data_pos
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q55_math_breadth" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS abs_d,
        |  CAST(ceil(l_quantity) AS BIGINT) AS ceil_q,
        |  floor((sqrt(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS sqrt_p,
        |  floor((ln(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS ln_p,
        |  floor((log10(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS log10_p,
        |  floor((exp(l_discount)) * 10000.0 + 0.5) / 10000.0 AS exp_d,
        |  floor((pow(l_tax, 2)) * 10000.0 + 0.5) / 10000.0 AS tax_sq,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d,
        |  l_orderkey % 7 AS mod7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
