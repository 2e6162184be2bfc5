package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** Cross-operator consistency properties for the round-13 additions —
  * invariants the DuckDB oracle cannot express (each query hash-matches
  * its own SQL twin; these check the queries against EACH OTHER, which
  * is the point of a composed pipeline: the stages must agree about the
  * corpus they hand one another). */
class RoundThirteenPropertySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q353 manifest totals == q354 funnel's 6_mixed stage — the " +
    "manifest ships exactly the docs the funnel says survived") {
    val manifest = q("q353_corpus_build")
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t")).head()
    val mixedRow = q("q354_corpus_attrition")
      .filter(col("stage") === "6_mixed").head()
    assert(manifest.getLong(0) == mixedRow.getAs[Long]("n_docs"),
      s"manifest docs ${manifest.getLong(0)} != funnel ${mixedRow}")
    assert(manifest.getLong(1) == mixedRow.getAs[Long]("n_tokens"),
      s"manifest tokens ${manifest.getLong(1)} != funnel ${mixedRow}")
  }

  test("q354 funnel is monotone non-increasing in docs and tokens") {
    val rows = q("q354_corpus_attrition").orderBy("stage").collect()
    assert(rows.length == 6)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_docs") >= b.getAs[Long]("n_docs") &&
        a.getAs[Long]("n_tokens") >= b.getAs[Long]("n_tokens"),
        s"stage ${b.getString(0)} grew the corpus: $a -> $b")
    }
  }

  test("q355 sweep: budget=512 cells reproduce q353's per-split pack " +
    "counts, fill <= 1, halving the budget never reduces pack count") {
    val sweep = q("q355_pack_sweep").collect()
      .map(r => (r.getAs[Long]("budget"), r.getAs[String]("split")) -> r)
      .toMap
    val manifest512 = q("q353_corpus_build").groupBy("split")
      .agg(sum("n_packs").as("n_packs"), sum("n_docs").as("n_docs"))
      .collect()
    assert(manifest512.nonEmpty)
    manifest512.foreach { m =>
      val cell = sweep((512L, m.getAs[String]("split")))
      assert(cell.getAs[Long]("n_packs") == m.getAs[Long]("n_packs"),
        s"512-budget sweep disagrees with the manifest on ${m}")
      assert(cell.getAs[Long]("n_docs") == m.getAs[Long]("n_docs"))
    }
    sweep.values.foreach { r =>
      // provable fill bound for contiguous packing with the straddler
      // convention: with no oversize docs the last doc starts inside
      // pack n_packs−1 and carries ≤ budget tokens past it, so
      // tokens < n_packs·budget + budget ⟹ fill < 1 + 1/n_packs. The
      // old `fill ≤ 1` only ever held by data accident — the r17
      // policy-quota mix shrank sf0.001's val split to 28 docs / 6
      // packs at budget 256, where the boundary term (1/6) is visible.
      val nPacks = r.getAs[Long]("n_packs")
      if (r.getAs[Long]("n_oversize") == 0L)
        assert(r.getAs[Long]("fill_e4") * nPacks <=
          10000L * (nPacks + 1L),
          s"fill ratio above the 1 + 1/n_packs straddler bound in $r")
      assert(r.getAs[Long]("n_oversize") >= 0L)
    }
    // fewer tokens per pack => at least as many packs
    sweep.keys.map(_._2).toSet.foreach { s: String =>
      assert(sweep((256L, s)).getAs[Long]("n_packs") >=
        sweep((512L, s)).getAs[Long]("n_packs"))
      assert(sweep((512L, s)).getAs[Long]("n_packs") >=
        sweep((1024L, s)).getAs[Long]("n_packs"))
    }
  }

  test("q357 release audit: every check passes on the shipped corpus — " +
    "including the train fraction the unsalted-mix form failed") {
    val rows = q("q357_release_audit").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("pass") == 1L, s"release check failed: $r")
    }
    // the decorrelation regression pin: with the mix fill order salted,
    // the split fraction sits near 80% (the unsalted form measured 8961
    // here — mix and split shared one hash, so 'kept' ⊆ 'small hash')
    val frac = rows.find(_.getString(0) == "5_train_frac_e4").get
      .getAs[Long]("observed")
    assert(frac >= 7000L && frac <= 8700L,
      s"train fraction $frac drifted — mix/split hash correlation?")
  }

  test("q356 richness: chao1 >= observed vocab, f1+f2 <= vocab, " +
    "unseen mass < 1") {
    val rows = q("q356_vocab_richness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vocab = r.getAs[Long]("vocab")
      assert(r.getAs[Long]("chao1_e2") >= vocab * 100L,
        s"Chao1 below the observed vocabulary in $r")
      assert(r.getAs[Long]("f1") + r.getAs[Long]("f2") <= vocab)
      assert(r.getAs[Long]("unseen_mass_e9") >= 0L &&
        r.getAs[Long]("unseen_mass_e9") < 1000000000L)
    }
  }
}
