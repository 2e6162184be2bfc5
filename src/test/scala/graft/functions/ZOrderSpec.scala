package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.sources.Formats

/** Z-order: the Column and SQL forms must agree with each other and with a
  * bit-by-bit Scala model, and writeZOrdered must actually cluster BOTH
  * dimensions into files (the property row-group pruning depends on). */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Reference model: bit i of dim j lands at position i*n + j. */
  private def model(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (i <- 0 until bits; j <- 0 until n)
      z |= ((vals(j) >> i) & 1L) << (i * n + j)
    z
  }

  test("Column interleave matches the bit model") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (31L, 31L), (5L, 9L),
      (1023L, 0L), (0L, 1023L), (512L, 511L))
    val got = rows.toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 10).as("z"))
      .as[Long].collect()
    val want = rows.map { case (a, b) => model(Seq(a, b), 10) }
    assert(got.toSeq == want)
  }

  test("SQL mirror computes the identical key (run through Spark SQL)") {
    val rows = Seq((0L, 0L, 0L), (7L, 3L, 5L), (15L, 15L, 15L), (8L, 1L, 2L))
    rows.toDF("a", "b", "c").createOrReplaceTempView("zin")
    val sql = ZOrder.interleaveSql(Seq("a", "b", "c"), bits = 4)
    val viaSql = spark.sql(s"SELECT $sql AS z FROM zin").as[Long].collect()
    val viaCol = rows.toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .as[Long].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.toSeq == rows.map(r => model(Seq(r._1, r._2, r._3), 4)))
  }

  test("bucket forms agree and are non-negative for negative inputs") {
    val xs = Seq(-17L, -1L, 0L, 1L, 99L, 101L).toDF("x")
    xs.createOrReplaceTempView("bin")
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.bucketSql("x", 100)} AS b FROM bin").as[Long].collect()
    val viaCol = xs.select(ZOrder.bucket(col("x"), 100).as("b"))
      .as[Long].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.forall(b => b >= 0 && b < 100))
  }

  test("rejects bit widths that overflow a signed int64") {
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("a"), col("b")), 32)
    }
    intercept[IllegalArgumentException] { ZOrder.interleaveSql(Seq(), 4) }
  }

  test("writeZOrdered clusters both dimensions into files") {
    // full 32x32 grid; 4 z-range files should land near quadrants, so each
    // file spans ~half of EACH dimension — a single-column sort would leave
    // the second dimension spanning the full range in every file
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)).toDF("x", "y").repartition(8)
    Formats.writeZOrdered(grid, dir,
      Seq(col("x"), col("y")), bits = 5, numFiles = 4)

    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .select("sx", "sy").as[(Long, Long)].collect()
    assert(spans.length == 4, s"expected 4 files, got ${spans.length}")
    // range-partition boundaries are sampled → allow slack over the ideal 15
    assert(spans.forall { case (sx, sy) => sx <= 23 && sy <= 23 },
      s"per-file spans too wide: ${spans.mkString(", ")}")
  }
}
