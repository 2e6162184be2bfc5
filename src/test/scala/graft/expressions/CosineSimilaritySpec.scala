package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class CosineSimilaritySpec extends SparkSuite {
  import spark.implicits._

  test("known vectors") {
    CosineSimilarity.register(spark)
    val got = Seq((Seq(1.0, 2.0), Seq(2.0, 3.0))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).head().getDouble(0)
    val want = (1 * 2 + 2 * 3) / (math.sqrt(1 + 4) * math.sqrt(4 + 9))
    assert(math.abs(got - want) < 1e-15)
  }

  test("bit-identical to the higher-order-function formulation") {
    CosineSimilarity.register(spark)
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val pairs = e.limit(50).crossJoin(
      e.limit(5).select(col("v").as("qv"), col("vec_id").as("q2")))
    val hof = "aggregate(zip_with(v, qv, (x, y) -> x * y), cast(0.0 AS double), (acc, z) -> acc + z)" +
      " / (sqrt(aggregate(v, cast(0.0 AS double), (acc, x) -> acc + x * x))" +
      " * sqrt(aggregate(qv, cast(0.0 AS double), (acc, x) -> acc + x * x)))"
    val diff = pairs
      .select(expr("cosine_sim(v, qv)").as("a"), expr(hof).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
  }

  test("dimension mismatch and zero vectors yield null, not garbage") {
    CosineSimilarity.register(spark)
    val rows = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),       // mismatched dims
      (Seq(0.0, 0.0), Seq(1.0, 2.0)))  // zero norm
      .toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("c")).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("null array input propagates null") {
    CosineSimilarity.register(spark)
    val r = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).head()
    assert(r.isNullAt(0))
  }
}
