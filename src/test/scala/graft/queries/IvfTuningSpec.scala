package graft.queries

import graft.{SparkEntry, SparkSuite}
import org.apache.spark.sql.functions._

/** The IVF probe-count tuning table (q381) and its deployment knob —
  * q380/LshTuningSpec's discipline pointed at the other ANN index dial:
  * the table must exhibit the monotone recall/cost trade nprobe buys
  * (more probed cells = more candidates = recall up), exactly one arm
  * is chosen by the smallest-clearing-the-bar rule, and q56 actually
  * consumes the pick through `spark.graft.ivf.nprobe`. */
class IvfTuningSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  private def table(dir: String) =
    SparkEntry.queries("q381_ivf_probe_tuning")(spark, dir)
      .collect().sortBy(_.getAs[Long]("nprobe"))

  test("q381 measures the probe trade: candidates and recall are " +
    "monotone non-decreasing in nprobe, and probing all ranked cells " +
    "is strictly more work than the narrowest arm") {
    val t = table(sf)
    assert(t.length == 3)
    val cand = t.map(_.getAs[Long]("n_cand"))
    val rec = t.map(_.getAs[Long]("recall_e4"))
    assert(cand(0) <= cand(1) && cand(1) <= cand(2),
      s"candidate volume must grow with nprobe: ${cand.toSeq}")
    assert(cand(2) > cand(0),
      s"the widest arm must actually probe more: ${cand.toSeq}")
    assert(rec(0) <= rec(1) && rec(1) <= rec(2),
      s"recall@10 must be monotone in nprobe (a probed superset can " +
        s"only add true neighbors): ${rec.toSeq}")
  }

  test("q381's chosen row IS the sizing rule: the smallest arm whose " +
    "measured recall clears 0.7, widest as fallback") {
    val t = table(sf)
    val chosen = t.filter(_.getAs[Long]("chosen") == 1L)
    assert(chosen.length == 1,
      s"exactly one arm must be chosen, got ${chosen.length}")
    val want = t.find(_.getAs[Long]("recall_e4") >= 7000L)
      .getOrElse(t.last).getAs[Long]("nprobe")
    assert(chosen.head.getAs[Long]("nprobe") == want,
      s"chosen ${chosen.head.getAs[Long]("nprobe")} != rule's $want")
  }

  test("q56 consumes the deployment probe conf: the tuned query equals " +
    "the explicit-method construction at that nprobe") {
    import graft.operators.SimilaritySearch
    val want = SimilaritySearch.topK(
        graft.Tables.load(spark, sf, "embeddings")
          .select(col("vec_id"), col("label"),
            expr("transform(embedding, x -> cast(x AS double))").as("v")),
        graft.Tables.load(spark, sf, "embeddings")
          .filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"),
            expr("transform(embedding, x -> cast(x AS double))").as("v")),
        "vec_id", "v", "q_id", 10,
        SimilaritySearch.IvfProbe(31, 4096, 12))
      .withColumnRenamed("rank", "ivf_rank")
      .collect().map(_.mkString("|")).toSet
    spark.conf.set("spark.graft.ivf.nprobe", "12")
    try {
      val got = SparkEntry.queries("q56_knn_ivf")(spark, sf)
        .collect().map(_.mkString("|")).toSet
      assert(got == want,
        "q56 under spark.graft.ivf.nprobe=12 must equal the explicit " +
          "IvfProbe(nprobe=12) construction")
    } finally spark.conf.unset("spark.graft.ivf.nprobe")
  }

  test("a non-positive probe count fails FAST instead of probing no " +
    "cells and returning an empty top-k (ADVICE r18)") {
    for (bad <- Seq("0", "-2")) {
      spark.conf.set("spark.graft.ivf.nprobe", bad)
      try intercept[IllegalArgumentException] {
        SparkEntry.queries("q56_knn_ivf")(spark, sf)
      } finally spark.conf.unset("spark.graft.ivf.nprobe")
    }
  }
}
