package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Rounding.roundf
import graft.operators.Lsh

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (BASELINE.json north star).
  *
  * q50 is the exact baseline: brute-force cosine top-k of a small broadcast
  * query set against all vectors — one broadcast nested-loop join, no
  * shuffle of the big side, dot products as codegen'd higher-order array
  * functions (no UDF).
  *
  * q51 is the scale path: sign-LSH bucketing (deterministic hyperplanes,
  * Lsh.scala) so each query only scores its own bucket. At 100 TB the
  * bucket join replaces the full scan per query; recall is checked against
  * q50 in SimilaritySpec.
  */
object SimilarityQueries extends QueryPack {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))

  /** Native codegen'd expression (graft.expressions.CosineSimilarity) —
    * fused dot+norms loop, same accumulation order as the HOF chain and
    * DuckDB's list_cosine_similarity, so oracle-bit-compatible. */
  private val cosine = "cosine_sim(v, qv)"

  /** Brute-force cosine top-10 for query vectors vec_id < 5. */
  private def q50(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        roundf(expr(cosine), 4).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("knn_rank", row_number().over(w).cast("long"))
      .filter(col("knn_rank") <= 10)
      .orderBy("q_id", "knn_rank")
  }

  /** Sign-LSH bucketed ANN: 8 deterministic hyperplanes → 8-bit bucket key;
    * candidates share the bucket; exact cosine re-rank within bucket. */
  private def q51(s: SparkSession, dir: String): DataFrame = {
    val planes = Lsh.hyperplanes(8, 64)
    def sigCol(vcol: Column): Column = concat(planes.map { p =>
      val arr = array(p.map(lit).toIndexedSeq: _*)
      val d = aggregate(zip_with(vcol, arr, (x, y) => x * y), lit(0.0),
        (acc, z) => acc + z)
      when(d >= 0, lit("1")).otherwise(lit("0"))
    }.toSeq: _*)
    val e = emb(s, dir).withColumn("bucket", sigCol(col("v")))
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val scored = e.join(broadcast(qv), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        roundf(expr(cosine), 4).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("knn_rank", row_number().over(w).cast("long"))
      .filter(col("knn_rank") <= 10)
      .orderBy("q_id", "knn_rank")
  }

  val defs: Map[String, Q] = Map(
    "q50_knn_cosine" -> (q50 _),
    "q51_knn_lsh" -> (q51 _))

  // q51 has no oracle: the LSH bucketing is not naturally SQL-portable
  // (deterministic plane literals would bloat the SQL); the driver records a
  // rows-only check and SimilaritySpec asserts recall vs q50.
  val oracle: Map[String, String] = Map(
    "q50_knn_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q_id, vec_id, floor((list_cosine_similarity(v, qv)) * 10000.0 + 0.5) / 10000.0 AS cos
        |  FROM e, q WHERE vec_id <> q_id),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS knn_rank
        |  FROM scored)
        |SELECT q_id, vec_id, cos, knn_rank FROM ranked
        |WHERE knn_rank <= 10 ORDER BY q_id, knn_rank""".stripMargin)
}
