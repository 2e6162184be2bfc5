package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Ols
import graft.pipeline.Normalize

/** Property-based invariants (SURVEY.md §5 strategy item 2), driven by
  * ScalaCheck generators with fixed seeds (deterministic CI). */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val smallDouble = Gen.choose(-100.0, 100.0)

  test("OLS recovers exact coefficients for any linear data (property)") {
    for (Seq(b0, b1, b2) <- sample(Gen.listOfN(3, smallDouble), 10)) {
      val rows = (0 until 15).map { t =>
        val a = (t * 37 % 11).toDouble
        val b = (t * 53 % 13).toDouble
        ("g", a, b, b0 + b1 * a + b2 * b)
      }
      val c = Ols.fit(rows.toDF("grp", "a", "b", "y"), "grp",
        Seq("a", "b"), "y").head().getSeq[Double](1)
      assert(math.abs(c(0) - b0) < 1e-6 && math.abs(c(1) - b1) < 1e-6 &&
        math.abs(c(2) - b2) < 1e-6, s"coef=$c want=($b0,$b1,$b2)")
    }
  }

  test("OLS fit invariant under feature-column order permutation") {
    // the reference's fuzzy matching makes column order explicitly
    // irrelevant (SURVEY §5); the fitted surface must agree either way
    val rows = (0 until 20).map { t =>
      val a = (t * 37 % 11).toDouble
      val b = (t * 53 % 13).toDouble
      ("g", a, b, 1.5 + 2.0 * a - 0.25 * b + (t % 3) * 0.1)
    }
    val df = rows.toDF("grp", "a", "b", "y")
    val c1 = Ols.fit(df, "grp", Seq("a", "b"), "y").head().getSeq[Double](1)
    val c2 = Ols.fit(df, "grp", Seq("b", "a"), "y").head().getSeq[Double](1)
    assert(math.abs(c1(0) - c2(0)) < 1e-8)
    assert(math.abs(c1(1) - c2(2)) < 1e-8)
    assert(math.abs(c1(2) - c2(1)) < 1e-8)
  }

  test("union row count equals sum of input counts (property)") {
    for (Seq(n, m) <- sample(Gen.listOfN(2, Gen.choose(0, 50)), 8)) {
      val a = (0 until n).map(i => (i.toLong, s"a$i")).toDF("id", "v")
      val b = (0 until m).map(i => (i.toLong, s"b$i")).toDF("id", "v")
      assert(a.unionByName(b).count() == n.toLong + m)
    }
  }

  test("normalize is idempotent for arbitrary suffixed frames (property)") {
    val gen = for {
      sym <- Gen.oneOf("AAPL", "MSFT", "GOOG")
      n <- Gen.choose(1, 5)
    } yield (sym, n)
    for ((sym, n) <- sample(gen, 8)) {
      val df = (0 until n).map(i =>
        (f"2024-01-01 $i%02d:00:00", 1.0 + i, 100L + i))
        .toDF("Datetime_", s"Close_$sym", s"Volume_$sym")
      val once = Normalize(df, Some(sym))
      val twice = Normalize(once, Some(sym))
      assert(once.schema == twice.schema)
      assert(once.collect().toSeq == twice.collect().toSeq)
    }
  }

  test("tokenCount equals number of words for arbitrary whitespace (property)") {
    val gen = for {
      words <- Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
      seps <- Gen.listOfN(words.size, Gen.oneOf(" ", "  ", "\t", " \t "))
    } yield (words.take(20), seps)
    for ((words, seps) <- sample(gen, 8)) {
      val text = words.zip(seps).map { case (w, s) => w + s }.mkString
      val got = Seq(text).toDF("t")
        .select(graft.functions.TextAnalysis.tokenCount(col("t")))
        .head().getLong(0)
      assert(got == words.size, s"text=[$text] got=$got want=${words.size}")
    }
  }
}
