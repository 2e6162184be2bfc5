package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run one named query from [[SparkEntry.queries]] with the
  * bench session config, print per-pass wall time and the formatted plan.
  *
  * {{{
  * java -cp "target/scala-2.13/classes:<spark jars>" graft.RunQuery \
  *   q100_fuzzy_match /root/testdata/sf0.1 2 [explain]
  * }}}
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(s"pass $i: rows=$n t=${(System.nanoTime() - t0) / 1e9}s")
    }
    if (explain) fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
