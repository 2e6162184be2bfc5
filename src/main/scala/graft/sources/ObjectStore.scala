package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-store access (the reference's entire storage layer is an
  * S3-compatible MinIO reached through boto3 — `scripts/minio_utils.py`,
  * call sites `scripts/transform.py:28-30`, `scripts/stock_ingestor.py:17`).
  *
  * This engine is scheme-agnostic by construction: every stage resolves its
  * zone through `FileSystem.get(URI, hadoopConf)` and `spark.read/write`
  * on full URIs, never `java.io.File` — so pointing `Pipeline.run` at
  * `s3a://bucket/prefix` instead of `/local/dir` changes NOTHING in the
  * code path (ObjectStoreSpec proves the property by running the pipeline
  * over a non-`file:` URI scheme). What s3a additionally needs is (a) the
  * `hadoop-aws` + AWS bundle jars on the classpath, and (b) the configs
  * below — all public Hadoop knobs.
  */
object ObjectStore {

  /** Hadoop configuration for an S3-compatible endpoint (MinIO, Ceph, S3).
    * `pathStyle = true` is required for MinIO (bucket-in-path addressing).
    *
    * NOTE committers: these fs.s3a.* keys alone do NOT change how Spark SQL
    * commits writes — by default `df.write` still uses the rename-based
    * FileOutputCommitter (O(data), non-atomic on object stores). Routing
    * writes through the S3A "magic" committer additionally requires the
    * spark-hadoop-cloud module on the classpath and the session configs in
    * [[s3aCommitterSparkConfs]], which bind Spark's commit protocol to
    * Hadoop's PathOutputCommitter factory (the thing that honors
    * `fs.s3a.committer.name`). */
  def s3aConfigs(endpoint: String, accessKey: String, secretKey: String,
      pathStyle: Boolean = true, ssl: Boolean = false)
      : Map[String, String] = Map(
    "fs.s3a.endpoint" -> endpoint,
    "fs.s3a.access.key" -> accessKey,
    "fs.s3a.secret.key" -> secretKey,
    "fs.s3a.path.style.access" -> pathStyle.toString,
    "fs.s3a.connection.ssl.enabled" -> ssl.toString,
    "fs.s3a.committer.name" -> "magic",
    "fs.s3a.committer.magic.enabled" -> "true")

  /** Session (NOT hadoop) configs that actually route Spark SQL writes
    * through the path-output committer machinery; requires
    * spark-hadoop-cloud (and its BindingParquetOutputCommitter) on the
    * classpath — set at session build time alongside [[s3aConfigs]]. */
  def s3aCommitterSparkConfs: Map[String, String] = Map(
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter")

  /** Apply s3a configs to a live session (runtime-settable: hadoopConf is
    * read per-job). */
  def configureS3a(spark: SparkSession, endpoint: String,
      accessKey: String, secretKey: String,
      pathStyle: Boolean = true, ssl: Boolean = false): Unit =
    s3aConfigs(endpoint, accessKey, secretKey, pathStyle, ssl).foreach {
      case (k, v) => spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}
