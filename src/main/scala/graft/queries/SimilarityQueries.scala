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

  /** IVF-style ANN: a deterministic coarse quantizer (every 97th vector is
    * a centroid), each vector assigned to its nearest centroid cell, queries
    * probe their 2 nearest cells and re-rank exactly within them.
    *
    * 100 TB posture: the centroid table is tiny (N/97 rows capped in
    * practice to a few thousand k-means centroids) → both the assignment
    * pass and the probe pass are broadcast joins over one scan of the
    * vectors; the candidate join shuffles on cell id, so per-task work is
    * bounded by cell size, not corpus size. Assignment ordering uses RAW
    * cosines (bit-identical in both engines — same fold order), so cell
    * membership matches the oracle exactly. */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cent = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("c_id"))
    val assigned = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("v"), col("c_id"),
        expr("cosine_sim(v, cv)").as("ccos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("c_id"))
    val qv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("q_id")
      .orderBy(col("qcos").desc, col("c_id"))
    val probes = qv.crossJoin(broadcast(cent))
      .select(col("q_id"), col("qv"), col("c_id"),
        expr("cosine_sim(qv, cv)").as("qcos"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= 2)
      .select(col("q_id"), col("qv"), col("c_id"))
    val wTop = Window.partitionBy("q_id")
      .orderBy(col("cos_raw").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        expr("cosine_sim(v, qv)").as("cos_raw"))
      .withColumn("ivf_rank", row_number().over(wTop).cast("long"))
      .filter(col("ivf_rank") <= 10)
      .select(col("q_id"), col("vec_id"),
        roundf(col("cos_raw"), 4).as("cos"), col("ivf_rank"))
      .orderBy("q_id", "ivf_rank")
  }

  val defs: Map[String, Q] = Map(
    "q50_knn_cosine" -> (q50 _),
    "q51_knn_lsh" -> (q51 _),
    "q56_knn_ivf" -> (q56 _))

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
        |WHERE knn_rank <= 10 ORDER BY q_id, knn_rank""".stripMargin,
    "q56_knn_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id % 97 = 0),
        |assigned AS (
        |  SELECT vec_id, v, c_id FROM (
        |    SELECT e.vec_id, e.v, cent.c_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.c_id) AS rn
        |    FROM e, cent)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
        |probes AS (
        |  SELECT q_id, qv, c_id FROM (
        |    SELECT q.q_id, q.qv, cent.c_id,
        |      row_number() OVER (PARTITION BY q.q_id
        |        ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC, cent.c_id) AS rn
        |    FROM q, cent)
        |  WHERE rn <= 2),
        |ranked AS (
        |  SELECT q_id, vec_id,
        |    list_cosine_similarity(a.v, p.qv) AS cos_raw,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY list_cosine_similarity(a.v, p.qv) DESC, vec_id) AS BIGINT)
        |      AS ivf_rank
        |  FROM assigned a JOIN probes p USING (c_id)
        |  WHERE a.vec_id <> p.q_id)
        |SELECT q_id, vec_id,
        |  floor((cos_raw) * 10000.0 + 0.5) / 10000.0 AS cos, ivf_rank
        |FROM ranked WHERE ivf_rank <= 10 ORDER BY q_id, ivf_rank""".stripMargin)
}
