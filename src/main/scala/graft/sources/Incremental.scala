package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level incremental ingest: process each data file exactly once
  * across repeated batch runs, without moving or mutating the source.
  *
  * The reference's incremental model is "latest file per symbol wins"
  * (`scripts/transform.py:20-33` lists the bucket and keeps the newest
  * object per symbol) — correct for last-write-wins snapshots, wrong for
  * append-only logs where EVERY file must be processed once. This is the
  * log-shaped generalization every lakehouse ingest loop reimplements:
  * a manifest directory records the files already processed; a run reads
  * only the unseen files and, AFTER its outputs are durably written,
  * commits the new names to the manifest.
  *
  * Crash semantics are at-least-once by construction: a run that dies
  * between "outputs written" and "commit" reprocesses those files next
  * time (idempotent sinks — `SaveMode.Overwrite` per zone, or CDC
  * upserts via [[graft.operators.Merge]] — make that harmless, which is
  * exactly why the engine's sinks are idempotent). The commit itself is
  * one atomic rename of a uniquely-named temp file into the manifest
  * dir, so concurrent committers never torn-write each other; duplicate
  * names across manifest entries are collapsed on read.
  *
  * Listing and manifest IO are driver-side metadata operations (O(files)
  * names, not data); the DATA path stays a fully distributed
  * `spark.read` over exactly the unseen files.
  */
object Incremental {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)

  /** Ingest units under `dataDir`: non-hidden plain files AND non-hidden
    * DIRECTORIES — a Spark-written batch is a directory of part files
    * (the normal upstream output shape), and it must be tracked as one
    * unit, not invisibly skipped. Hidden/marker names (underscore/dot,
    * Spark's own convention) are excluded either way. */
  private def listData(spark: SparkSession, dataDir: String): Seq[String] = {
    val f = fs(spark, dataDir)
    val p = new Path(dataDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter { st =>
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath.toString)
  }

  /** Union of all committed manifest entries (one name per line). */
  def seenFiles(spark: SparkSession, manifestDir: String): Set[String] = {
    val f = fs(spark, manifestDir)
    val p = new Path(manifestDir)
    if (!f.exists(p)) Set.empty
    else {
      f.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".manifest"))
        .flatMap { st =>
          val in = f.open(st.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList
          finally in.close()
        }
        .filter(_.nonEmpty).toSet
    }
  }

  /** The files a run should process: listed minus committed. Sorted so
    * repeated calls are deterministic. */
  def newFiles(spark: SparkSession, dataDir: String,
               manifestDir: String): Seq[String] =
    (listData(spark, dataDir).toSet -- seenFiles(spark, manifestDir))
      .toSeq.sorted

  /** Read only the not-yet-committed files. None when nothing is new —
    * callers skip the batch instead of scheduling an empty job. */
  def readNew(spark: SparkSession, dataDir: String, manifestDir: String,
              format: String = "parquet"): Option[(DataFrame, Seq[String])] = {
    val files = newFiles(spark, dataDir, manifestDir)
    if (files.isEmpty) None
    else Some((spark.read.format(format).load(files: _*), files))
  }

  /** Record `files` as processed. Call AFTER the batch's outputs are
    * durable. One temp-write + atomic rename; the entry name embeds a
    * UUID so concurrent committers cannot collide. */
  def commit(spark: SparkSession, manifestDir: String,
             files: Seq[String]): Unit = {
    if (files.isEmpty) return
    val f = fs(spark, manifestDir)
    val dir = new Path(manifestDir)
    if (!f.exists(dir)) f.mkdirs(dir)
    val id = java.util.UUID.randomUUID().toString
    val tmp = new Path(dir, s".$id.tmp")
    val out = f.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(dir, s"$id.manifest")))
      throw new java.io.IOException(
        s"manifest commit rename failed under $manifestDir")
  }
}
