package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class OlsSpec extends SparkSuite {
  import spark.implicits._

  test("recovers exact linear coefficients with intercept") {
    // y = 2 + 3a - 0.5b, two groups, deterministic pseudo-random features
    val rows = for (g <- Seq("g1", "g2"); t <- 0 until 12) yield {
      val a = (t * 37 % 11).toDouble
      val b = (t * 53 % 13).toDouble
      (g, a, b, 2.0 + 3.0 * a - 0.5 * b)
    }
    val df = rows.toDF("grp", "a", "b", "y")
    val coef = Ols.fit(df, "grp", Seq("a", "b"), "y").collect()
    assert(coef.length == 2)
    coef.foreach { r =>
      val c = r.getSeq[Double](1)
      assert(math.abs(c(0) - 2.0) < 1e-8)
      assert(math.abs(c(1) - 3.0) < 1e-8)
      assert(math.abs(c(2) + 0.5) < 1e-8)
    }
  }

  test("singular design matrix: ridge fallback still fits exactly") {
    // b is an exact affine copy of a → XᵀX singular; sklearn's lstsq would
    // fit via pseudo-inverse, so we must not drop the group — the ridge
    // fallback must reproduce y (= a here) within tolerance.
    val df = (0 until 10).map(t => ("g", t.toDouble, 2.0 * t + 1, t * 1.0))
      .toDF("grp", "a", "b", "y")
    val fit = Ols.fit(df, "grp", Seq("a", "b"), "y")
    assert(fit.count() == 1)
    val c = fit.head().getSeq[Double](1)
    (0 until 10).foreach { t =>
      val pred = c(0) + c(1) * t + c(2) * (2.0 * t + 1)
      assert(math.abs(pred - t) < 1e-4, s"t=$t pred=$pred")
    }
  }

  test("matches regr_slope/regr_intercept in the single-feature case") {
    val df = (0 until 50)
      .map(t => ("g", (t * 31 % 17).toDouble, (t * 13 % 7).toDouble))
      .toDF("grp", "x", "y")
    val c = Ols.fit(df, "grp", Seq("x"), "y").head().getSeq[Double](1)
    val r = df.agg(expr("regr_intercept(y, x)"), expr("regr_slope(y, x)"))
      .head()
    assert(math.abs(c(0) - r.getDouble(0)) < 1e-8)
    assert(math.abs(c(1) - r.getDouble(1)) < 1e-8)
  }

  test("null features/target rows are dropped, not silently mixed in") {
    val clean = (0 until 12).map { t =>
      val a = (t * 37 % 11).toDouble
      ("g", Option(a), Option(2.0 + 3.0 * a))
    }
    // nulls interleaved; an all-null group must be dropped, not crash
    val rows = clean ++ Seq(("g", None: Option[Double], Option(5.0)),
      ("g", Option(1.0), None: Option[Double])) ++
      (0 until 3).map(_ => ("empty", None: Option[Double], Option(1.0)))
    val df = rows.toDF("grp", "a", "y")
    val fit = Ols.fit(df, "grp", Seq("a"), "y").collect()
    assert(fit.length == 1 && fit.head.getString(0) == "g")
    val c = fit.head.getSeq[Double](1)
    assert(math.abs(c(0) - 2.0) < 1e-8 && math.abs(c(1) - 3.0) < 1e-8)
  }

  test("predictExpr computes the dot product of coef and features") {
    val df = Seq((3.0, 4.0)).toDF("a", "b")
      .withColumn("coef", array(lit(1.0), lit(2.0), lit(0.5)))
    val got = df.select(Ols.predictExpr(Seq("a", "b")).as("p"))
      .head().getDouble(0)
    assert(math.abs(got - (1.0 + 2.0 * 3.0 + 0.5 * 4.0)) < 1e-12)
  }
}
