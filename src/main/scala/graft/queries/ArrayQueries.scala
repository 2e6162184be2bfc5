package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
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
        round(col("col"), 6).as("comp"))
      .orderBy("vec_id", "pos")

  val defs: Map[String, Q] = Map(
    "q37_wordcount" -> (q37 _),
    "q38_set_ops" -> (q38 _),
    "q53_explode_pos" -> (q53 _))

  val oracle: Map[String, String] = Map(
    "q37_wordcount" ->
      """WITH toks AS (
        |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents)
        |SELECT tok, count(*) AS n FROM toks WHERE tok <> ''
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin,
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
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos, round(v[pos], 6) AS comp
        |FROM p ORDER BY vec_id, pos""".stripMargin)
}
