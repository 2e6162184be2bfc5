package graft.queries

import graft.{SparkEntry, SparkSuite}

/** The MinHash banding knob — the r18 discipline (every index tuner's
  * chosen row has a deployment knob that consumes it) applied to the
  * third and last tuner: q270's band sweep already MEASURES the
  * recall/candidate trade over the 16-minhash signature; these tests
  * pin that `spark.graft.minhash.bands` actually re-segments q42's
  * banding, that the banding theory's subset law holds on real data (a
  * pair agreeing on a wide band agrees on every one of its sub-bands —
  * pigeonhole — so widening bands can only ADD candidates), and that
  * the deployed default is exactly q270's rule-pick on the driver's
  * gate corpus. */
class MinhashTuningSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  private def pairsAt(bands: Option[Int]): Map[(Long, Long), Double] = {
    bands.foreach(b =>
      spark.conf.set("spark.graft.minhash.bands", b.toString))
    try SparkEntry.queries("q42_dedup_minhash")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    finally spark.conf.unset("spark.graft.minhash.bands")
  }

  test("q42 consumes the banding conf, and candidates are subset-" +
    "monotone in band count (wide-band agreement implies sub-band " +
    "agreement)") {
    val p2 = pairsAt(Some(2))
    val p4 = pairsAt(None) // the deployed default
    val p8 = pairsAt(Some(8))
    assert(p2.keySet.subsetOf(p4.keySet) && p4.keySet.subsetOf(p8.keySet),
      s"banding subset law violated: |2|=${p2.size} |4|=${p4.size} " +
        s"|8|=${p8.size}, 2-only=${(p2.keySet -- p4.keySet).take(3)} " +
        s"4-only=${(p4.keySet -- p8.keySet).take(3)}")
    assert(p8.size > p2.size,
      s"more bands must surface strictly more candidates here: " +
        s"|2|=${p2.size} |8|=${p8.size}")
    // the estimate is the SIGNATURE's, not the banding's: common pairs
    // score identically under every geometry
    assert(p2.forall { case (k, v) => p8(k) == v } &&
        p4.forall { case (k, v) => p8(k) == v },
      "est_sim must be banding-independent (same 16-minhash signature)")
  }

  test("the deployed default band count IS q270's rule-pick on the " +
    "driver's gate corpus: smallest bands whose measured recall clears " +
    "0.95") {
    // q270 sweeps the SAME 16-minhash signature at 2/4/8 bands against
    // the exact 3-gram-Jaccard >= 0.5 truth set; the sizing rule reads
    // its table the way q380/q381's chosen columns do. sf0.01 is the
    // driver's correctness gate, so the default is pinned there.
    val t = SparkEntry.queries("q270_lsh_tuning")(spark,
        "/root/testdata/sf0.01")
      .collect().sortBy(_.getAs[Long]("bands"))
    val pick = t.find(_.getAs[Long]("recall_e4") >= 9500L)
      .getOrElse(t.last).getAs[Long]("bands")
    assert(pick == 4L,
      s"q270's rule now picks $pick bands (recalls ${t.map(r =>
        r.getAs[Long]("bands") -> r.getAs[Long]("recall_e4")).toSeq}) " +
        "— re-tune q42's default B and the oracle together, the way " +
        "the geometry mechanism prescribes")
  }

  test("a misconfigured band count fails FAST instead of returning " +
    "empty/wrong results (ADVICE r18: 16 % -4 == 0, so divisibility " +
    "alone would let a negative count through to an empty q42)") {
    for (bad <- Seq("0", "-4", "3")) {
      spark.conf.set("spark.graft.minhash.bands", bad)
      try intercept[IllegalArgumentException] {
        SparkEntry.queries("q42_dedup_minhash")(spark, sf)
      } finally spark.conf.unset("spark.graft.minhash.bands")
    }
  }
}
