package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format adapters (SURVEY.md §2.1): the reference moves data
  * between zones as JSON (raw) and Parquet (processed/combined/predictions);
  * this engine additionally speaks CSV and line-delimited JSON with pinned,
  * reproducible options, and writes hive-partitioned parquet for
  * partition-pruned scans at 100 TB.
  *
  * All readers take an explicit schema: schema inference is a full extra
  * pass over the data (unacceptable at scale) and non-deterministic across
  * samples — an explicit `StructType` is both faster and contract-stable.
  */
object Formats {

  // full microsecond precision: events timestamps are µs-grained, and a
  // millisecond format would silently truncate them on write
  private val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** CSV with header, ISO timestamps, explicit nulls. One file layout
    * decision per call site: pass a pre-`repartition`ed df to control file
    * counts.
    *
    * RESERVED MARKER: the null sentinel `\N` (the de-facto standard from
    * mysqldump/Hive text tables) is reserved — a STRING cell whose entire
    * content is the two characters backslash-N round-trips to null, because
    * the CSV reader substitutes the marker after unquoting (quoting does
    * not protect it). Data that may legitimately contain bare `\N` strings
    * belongs in JSONL/parquet (lossless for all strings); FormatsSpec pins
    * this contract. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .option("nullValue", "\\N")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .option("nullValue", "\\N")
      .schema(schema)
      .csv(path)

  /** Line-delimited JSON (the scalable cousin of the reference's
    * one-array-per-file raw zone: splittable, streamable). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", tsFmt)
      .json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", tsFmt)
      .schema(schema)
      .json(path)

  /** Hive-partitioned parquet: the 100 TB layout primitive. A filter on the
    * partition column prunes directories at planning time (PartitionFilters
    * in the scan — FormatsSpec asserts it), so a day/category slice of a
    * petabyte table reads only its own files. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a parquet directory's small files toward `targetBytes` per
    * file — the standing maintenance task of every streaming/incremental
    * pipeline (each micro-batch or retry leaves small files; a 100 TB
    * table read at 10 MB a file is 10M scan tasks and an object-store
    * listing storm). Sizing uses the FileSystem listing (metadata only,
    * no data pass); the rewrite is one round-robin repartition to the
    * computed file count. Returns (filesBefore, filesAfter).
    *
    * The rewrite goes through a temp sibling directory + rename swap: a
    * failed compaction leaves the original data untouched (on HDFS-like
    * stores the swap is atomic; on object stores pair this with the
    * committer notes in [[ObjectStore]]). */
  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val dataFiles = fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
    }
    val before = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (targetFiles < before) {
      val tmp = new org.apache.hadoop.fs.Path(
        dir.getParent, s".${dir.getName}_compacting")
      spark.read.parquet(path)
        .repartition(targetFiles)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val old = new org.apache.hadoop.fs.Path(
        dir.getParent, s".${dir.getName}_old")
      require(fs.rename(dir, old), s"could not move $dir aside")
      require(fs.rename(tmp, dir), s"could not move compacted data into $dir")
      fs.delete(old, true)
    }
    val after = fs.listStatus(dir).count { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
    }
    (before, after)
  }
}
