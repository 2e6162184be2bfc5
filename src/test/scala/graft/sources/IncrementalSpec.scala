package graft.sources

import java.nio.file.Files
import graft.SparkSuite

/** Exactly-once-per-file semantics of the incremental manifest: unseen
  * files only, at-least-once on missed commit, empty-batch skip, and
  * commit idempotence under duplicate entries. */
class IncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def writeBatch(dir: String, name: String, ids: Seq[Long]): Unit = {
    val tmp = Files.createTempDirectory("graft_inc_w").toString
    ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      new java.io.File(dir, name).toPath)
  }

  test("reads only unseen files across runs; empty batch returns None") {
    val data = Files.createTempDirectory("graft_inc_d").toString
    val man = Files.createTempDirectory("graft_inc_m").toString + "/manifest"

    writeBatch(data, "a.parquet", Seq(1L, 2L))
    val Some((df1, files1)) = Incremental.readNew(spark, data, man)
    assert(df1.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(files1.size == 1)
    Incremental.commit(spark, man, files1)

    // nothing new → None, no empty job
    assert(Incremental.readNew(spark, data, man).isEmpty)

    writeBatch(data, "b.parquet", Seq(3L))
    val Some((df2, files2)) = Incremental.readNew(spark, data, man)
    assert(df2.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(files2.size == 1 && files2 != files1)
  }

  test("missed commit means at-least-once, not data loss") {
    val data = Files.createTempDirectory("graft_inc_d2").toString
    val man = Files.createTempDirectory("graft_inc_m2").toString + "/manifest"
    writeBatch(data, "a.parquet", Seq(7L))
    val Some((_, files)) = Incremental.readNew(spark, data, man)
    // crash before commit: the same files come back on the next run
    val Some((again, filesAgain)) = Incremental.readNew(spark, data, man)
    assert(filesAgain == files)
    assert(again.select("id").as[Long].head() == 7L)
  }

  test("a Spark-written directory batch is one ingest unit") {
    val data = Files.createTempDirectory("graft_inc_d4").toString
    val man = Files.createTempDirectory("graft_inc_m4").toString + "/manifest"
    // upstream writes a batch the way df.write.parquet does: a DIRECTORY
    val s = spark
    import s.implicits._
    Seq(11L, 12L).toDF("id").write.parquet(s"$data/batch_001")
    val Some((df1, files1)) = Incremental.readNew(spark, data, man)
    assert(files1 == Seq(s"file:$data/batch_001") ||
      files1.exists(_.endsWith("batch_001")))
    assert(df1.select("id").as[Long].collect().sorted.toSeq == Seq(11L, 12L))
    Incremental.commit(spark, man, files1)
    Seq(13L).toDF("id").write.parquet(s"$data/batch_002")
    val Some((df2, _)) = Incremental.readNew(spark, data, man)
    assert(df2.select("id").as[Long].collect().toSeq == Seq(13L))
  }

  test("duplicate committed names collapse; hidden files are ignored") {
    val data = Files.createTempDirectory("graft_inc_d3").toString
    val man = Files.createTempDirectory("graft_inc_m3").toString + "/manifest"
    writeBatch(data, "a.parquet", Seq(1L))
    Files.write(new java.io.File(data, "_SUCCESS").toPath, Array[Byte]())
    Files.write(new java.io.File(data, ".hidden").toPath, Array[Byte](1))
    val Some((_, files)) = Incremental.readNew(spark, data, man)
    assert(files.size == 1) // marker + hidden excluded
    Incremental.commit(spark, man, files)
    Incremental.commit(spark, man, files) // double-commit is harmless
    assert(Incremental.seenFiles(spark, man) == files.toSet)
    assert(Incremental.readNew(spark, data, man).isEmpty)
  }
}
