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

  test("BMP codec round-trips any dims and pixel content (property)") {
    import graft.multimodal.ImageCodec
    val dims = for {
      w <- Gen.choose(1, 37)
      h <- Gen.choose(1, 29)
      seed <- Gen.choose(0, 1000000)
    } yield (w, h, seed)
    for ((w, h, seed) <- sample(dims, 25)) {
      val px = Array.tabulate[Byte](w * h * 3)(i => ((seed + i * 17) % 256).toByte)
      val back = ImageCodec.decodeBmp(
        ImageCodec.encodeBmp(ImageCodec.Bitmap(w, h, px))).get
      assert(back.width == w && back.height == h, s"dims ${w}x$h")
      assert(back.pixels.toSeq == px.toSeq, s"pixels ${w}x$h seed=$seed")
    }
  }

  test("BMP resize preserves corner pixels for any scale (property)") {
    import graft.multimodal.ImageCodec
    val cases = for {
      sw <- Gen.choose(2, 31); sh <- Gen.choose(2, 23)
      dw <- Gen.choose(1, 31); dh <- Gen.choose(1, 23)
    } yield (sw, sh, dw, dh)
    for ((sw, sh, dw, dh) <- sample(cases, 25)) {
      val px = Array.tabulate[Byte](sw * sh * 3)(i => (i % 251).toByte)
      val out = ImageCodec.resizeNearest(ImageCodec.Bitmap(sw, sh, px), dw, dh)
      assert(out.pixels.length == dw * dh * 3)
      // nearest-neighbor maps dst (0,0) to src (0,0) for any dimensions
      for (c <- 0 until 3)
        assert(out.pixels(c) == px(c), s"$sw x $sh -> $dw x $dh channel $c")
    }
  }

  test("WAV codec round-trips any sample content (property)") {
    import graft.multimodal.WavCodec
    val gens = for {
      n <- Gen.choose(0, 400)
      seed <- Gen.choose(0, 1000000)
    } yield (n, seed)
    for ((n, seed) <- sample(gens, 25)) {
      val s = Array.tabulate[Short](n)(i =>
        ((seed + i * 31) % 65536 - 32768).toShort)
      val w = WavCodec.decode(WavCodec.encode(WavCodec.Wav(8000, s))).get
      assert(w.samples.toSeq == s.toSeq, s"n=$n seed=$seed")
    }
  }

  test("Misra-Gries guarantee holds for any skew profile (property)") {
    import graft.functions.HeavyHitters
    val gens = for {
      hotShare <- Gen.choose(10, 60) // percent of stream on the hot item
      tailKinds <- Gen.choose(50, 500)
    } yield (hotShare, tailKinds)
    for ((hotShare, tailKinds) <- sample(gens, 8)) {
      val n = 2000
      val items = (0 until n).map { i =>
        if (i % 100 < hotShare) "hot" else s"t${i % tailKinds}"
      }
      // serial sketch (no Spark): reduce-only path with k=15 →
      // guarantee covers freq > n/16; hot has freq ≥ 10% ≥ 200 > 125
      val agg = new HeavyHitters(15)
      val sketch = items.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(sketch).contains("hot"),
        s"hotShare=$hotShare% tailKinds=$tailKinds lost the hot item")
    }
  }

  test("FuzzyMatch equals brute-force levenshtein<=1 on random strings " +
      "(property)") {
    import graft.operators.FuzzyMatch
    // tiny alphabet maximizes collisions/near-misses per corpus
    val word = Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (i <- 0 until 4) {
      val names = sample(Gen.listOfN(40, word), 1)(0).distinct
      val viaOp = FuzzyMatch
        .editDistance1Pairs(names.toDF("name"), "name")
        .as[(String, String)].collect().toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1)(identity)
        for (j <- 1 to b.length) {
          var prev = d(0); d(0) = j
          for (k <- 1 to a.length) {
            val t = d(k)
            d(k) = math.min(math.min(d(k) + 1, d(k - 1) + 1),
              prev + (if (a(k - 1) == b(j - 1)) 0 else 1))
            prev = t
          }
        }
        d(a.length)
      }
      val brute = (for {
        a <- names; b <- names if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      assert(viaOp === brute, s"round $i diverged")
    }
  }

  test("overlapBinned equals the naive overlap product on random " +
      "intervals (property)") {
    import graft.operators.RangeJoin
    val iv = for {
      lo <- Gen.choose(-50L, 150L)
      len <- Gen.choose(0L, 40L) // includes degenerate zero-length
    } yield (lo, lo + len)
    for (i <- 0 until 3) {
      val ls = sample(Gen.listOfN(30, iv), 1)(0).zipWithIndex
        .map { case ((lo, hi), id) => (id.toLong, lo, hi) }
      val rs = sample(Gen.listOfN(30, iv).map(_.map(p =>
        (p._1 + 7, p._2 + 7))), 1)(0).zipWithIndex
        .map { case ((lo, hi), id) => (id.toLong, lo, hi) }
      val left = ls.toDF("lid", "l_lo", "l_hi")
      val right = rs.toDF("rid", "r_lo", "r_hi")
      // the naive side must also exclude degenerate [x, x) intervals: the
      // bare predicate l_lo < r_hi && r_lo < l_hi wrongly matches an EMPTY
      // interval against any interval strictly containing its point — the
      // operator's hi > lo filter is the documented semantics
      val naive = left.filter(col("l_hi") > col("l_lo"))
        .crossJoin(right.filter(col("r_hi") > col("r_lo")))
        .filter(col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
        .select("lid", "rid")
      val out = RangeJoin.overlapBinned(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", 16L).select("lid", "rid")
      assert(out.exceptAll(naive).isEmpty && naive.exceptAll(out).isEmpty,
        s"round $i diverged (negative-domain intervals included)")
    }
  }

  test("q353 manifest is bit-identical across shuffle.partitions 4 vs 13 " +
    "(physical-layout determinism of the composed build)") {
    // the 100 TB determinism contract behind every exact-grid query: a
    // result must never depend on partition count, task scheduling, or
    // accumulation order. The composed corpus build chains every
    // order-sensitive construct in the engine (window fills, CC, md5
    // splits, contiguous packing, checksum sums) — if ANY stage leaked
    // partition-dependent state (a float sum, a first()/head, an
    // unseeded sample), the shard manifests would diverge between a
    // 4-way and a prime-13-way shuffle layout. Sessions are fresh (the
    // memo keys on session identity, so both builds run cold).
    def manifest(parts: Int): Seq[String] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries("q353_corpus_build")(s, "/root/testdata/sf0.001")
        .collect().map(_.toString).toSeq
    }
    val a = manifest(4)
    val b = manifest(13)
    assert(a.nonEmpty, "empty manifest — vacuous")
    assert(a == b, s"layout-dependent manifest:\n4  -> $a\n13 -> $b")
  }

  test("q67 CC labels are bit-identical across shuffle.partitions 4 vs " +
    "13 (layout determinism of the iterative component loop)") {
    // the other layout-sensitive machine: ConnectedComponents' round
    // loop (per-round min aggregations + convergence via observe). The
    // min-label contract is order-free BY ALGEBRA (min is commutative),
    // but a regression that slipped a first()/limit/partition-id into a
    // round would surface exactly here.
    def labels(parts: Int): Seq[(Long, Long, Boolean)] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts)
      SparkEntry.queries("q67_dedup_clusters")(s, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    }
    val a = labels(4)
    val b = labels(13)
    assert(a.nonEmpty && a.exists(!_._3),
      "no multi-doc cluster — vacuous fixture")
    assert(a == b, "layout-dependent CC labels")
  }
}
