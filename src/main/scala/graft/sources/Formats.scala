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
}
