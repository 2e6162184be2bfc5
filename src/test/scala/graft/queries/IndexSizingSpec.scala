package graft.queries

import graft.{SparkEntry, SparkSuite}
import graft.operators.Lsh

/** The unified index sizing plan (q382) — the r18 tuner-consumption
  * discipline rolled into one deployment artifact: the plan must name
  * exactly the three conf knobs the code actually reads, each row must
  * equal its own tuning table's chosen arm, and the LSH row must equal
  * the Scala sizing rule — so the artifact, the tables, and the code
  * can never disagree about what a deployment should set. */
class IndexSizingSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("q382 rows are each tuning table's own chosen arm, under exactly " +
    "the conf keys the code reads") {
    val plan = SparkEntry.queries("q382_index_sizing_plan")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(plan.keySet == Set("spark.graft.lsh.rowsPerBand",
      "spark.graft.ivf.nprobe", "spark.graft.minhash.bands"),
      s"plan knobs ${plan.keySet} must be the three deployment confs")
    val g = SparkEntry.queries("q380_lsh_geometry")(spark, sf)
      .collect().find(_.getAs[Long]("chosen") == 1L).get
    assert(plan("spark.graft.lsh.rowsPerBand") ==
      (g.getAs[Long]("rows_per_band"), g.getAs[Long]("recall_e4")))
    val i = SparkEntry.queries("q381_ivf_probe_tuning")(spark, sf)
      .collect().find(_.getAs[Long]("chosen") == 1L).get
    assert(plan("spark.graft.ivf.nprobe") ==
      (i.getAs[Long]("nprobe"), i.getAs[Long]("recall_e4")))
    val mh = SparkEntry.queries("q270_lsh_tuning")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bands"))
    val pick = mh.find(_.getAs[Long]("recall_e4") >= 9500L)
      .getOrElse(mh.last)
    assert(plan("spark.graft.minhash.bands") ==
      (pick.getAs[Long]("bands"), pick.getAs[Long]("recall_e4")))
  }

  test("the plan's LSH row IS Lsh.tunedGeometry's pick — artifact, " +
    "table, and code rule agree") {
    val plan = SparkEntry.queries("q382_index_sizing_plan")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = SparkEntry.queries("q380_lsh_geometry")(spark, sf)
      .collect().head.getAs[Long]("n_vectors")
    assert(plan("spark.graft.lsh.rowsPerBand") ==
      Lsh.tunedGeometry(n).rowsPerBand.toLong,
      "the deployment artifact and the code rule diverged")
  }
}
