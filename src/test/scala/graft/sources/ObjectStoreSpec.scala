package graft.sources

import java.net.URI
import java.nio.file.Files
import java.sql.Timestamp

import org.apache.hadoop.fs.RawLocalFileSystem
import graft.SparkSuite

/** A Hadoop FileSystem with a non-`file:` scheme backed by local disk —
  * registered via `fs.graftfs.impl` exactly the way `s3a://` registers
  * hadoop-aws. Running the pipeline over it proves every stage resolves
  * zones through the Hadoop FileSystem API (URI scheme → FS impl), never
  * `java.io.File` — the property that makes `s3a://bucket/prefix` a pure
  * config change (ObjectStore.s3aConfigs). */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}

class ObjectStoreSpec extends SparkSuite {
  import spark.implicits._

  test("pipeline runs end-to-end over a non-file URI scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = Files.createTempDirectory("graft_objstore").toString
    val workDir = s"graftfs://$local"
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val bars = (0 until 6).map { t =>
      ("AAPL", ts(t), 1.0 + t, 2.0 + t, 0.5 + t, 10.0 + 2 * t, 100L + t)
    }.toDF("symbol", "Datetime", "Open", "High", "Low", "Close", "Volume")

    val out = graft.pipeline.Pipeline.run(spark, bars, workDir)
    assert(out.columns.toSeq ==
      Seq("symbol", "predicted_close", "last_date", "mse"))
    assert(out.count() == 1)

    // the zones really live behind the scheme (readable via the same URIs)
    assert(spark.read.parquet(s"$workDir/combined").count() == 6)
    assert(spark.read.json(s"$workDir/raw/AAPL_stock_raw_20260101T000000Z.json")
      .count() == 6)
  }

  test("s3a config set is complete for a MinIO-style endpoint") {
    val c = ObjectStore.s3aConfigs("http://minio:9000", "ak", "sk")
    assert(c("fs.s3a.endpoint") == "http://minio:9000")
    assert(c("fs.s3a.path.style.access") == "true")
    assert(c.contains("fs.s3a.committer.name"))
  }
}
