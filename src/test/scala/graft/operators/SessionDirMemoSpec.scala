package graft.operators

import graft.SparkSuite

/** Retention contract of the two-slot memo: the driver's real access
  * pattern (correctness dir and bench dir interleaved in ONE session)
  * must keep both warm, and a third key must evict exactly the LRU —
  * the explicit bound that replaces the round-10 weak-key non-release. */
class SessionDirMemoSpec extends SparkSuite {

  private def df(tag: Int) = spark.range(tag).toDF("id")

  test("alternating two dirs never rebuilds — the driver's interleave " +
    "pattern stays warm") {
    val memo = new SessionDirMemo
    var builds = 0
    def get(dir: String) =
      memo.get(spark, dir) { builds += 1; df(builds) }
    get("/sf0.01"); get("/sf0.1")
    assert(builds == 2)
    // r11's single slot rebuilt on EVERY line below (6 extra builds)
    get("/sf0.01"); get("/sf0.1"); get("/sf0.01"); get("/sf0.1")
    get("/sf0.1"); get("/sf0.01")
    assert(builds == 2, s"dir interleave thrashed the memo: $builds builds")
    assert(memo.pinned == 2)
  }

  test("a third key evicts the least-recently-USED, not the oldest-built") {
    val memo = new SessionDirMemo
    var builds = 0
    def get(dir: String) =
      memo.get(spark, dir) { builds += 1; df(builds) }
    get("/a"); get("/b")
    get("/a") // touch /a: /b is now LRU
    get("/c") // evicts /b
    assert(builds == 3 && memo.pinned == 2)
    get("/a"); get("/c")
    assert(builds == 3, "eviction dropped a recently-used entry")
    get("/b")
    assert(builds == 4, "/b should have been evicted and need a rebuild")
  }

  test("eviction unpersists the evicted build's checkpoint blocks " +
    "eagerly (ADVICE r12) and leaves the kept slots' blocks alone") {
    val memo = new SessionDirMemo
    def ckpt(tag: Int) = df(tag).localCheckpoint(true)
    def blocksOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      }.toSet
    val a = memo.get(spark, "/a")(ckpt(10))
    val b = memo.get(spark, "/b")(ckpt(11))
    memo.get(spark, "/a")(fail("warm")) // /b becomes LRU
    memo.get(spark, "/c")(ckpt(12))     // evicts /b
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(blocksOf(b).forall(!persisted.contains(_)),
      "evicted /b's checkpoint blocks were not unpersisted")
    assert(blocksOf(a).forall(persisted.contains),
      "kept slot /a lost its blocks to the eviction")
  }

  test("multi-frame values (SessionDirMemoOf) unpersist EVERY member " +
    "frame on eviction — a k-means fit's centroids AND assignment") {
    val memo = new SessionDirMemoOf[
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
      p => Seq(p._1, p._2))
    def ckpt(tag: Int) = df(tag).localCheckpoint(true)
    def blocksOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      }.toSet
    val a = memo.get(spark, "/a")((ckpt(10), ckpt(11)))
    val b = memo.get(spark, "/b")((ckpt(12), ckpt(13)))
    memo.get(spark, "/a")(fail("warm")) // /b becomes LRU
    memo.get(spark, "/c")((ckpt(14), ckpt(15))) // evicts /b
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert((blocksOf(b._1) ++ blocksOf(b._2)).forall(!persisted.contains(_)),
      "an evicted tuple member's checkpoint blocks were not unpersisted")
    assert((blocksOf(a._1) ++ blocksOf(a._2)).forall(persisted.contains),
      "a kept tuple slot lost blocks to the eviction")
  }

  test("hits return the identical materialized frame, misses are keyed " +
    "by (session, dir) identity") {
    val memo = new SessionDirMemo
    val a = memo.get(spark, "/x")(df(7))
    assert(memo.get(spark, "/x")(fail("must not rebuild")) eq a)
    // a different session object with the same dir is a different key
    val s2 = spark.newSession()
    val b = memo.get(s2, "/x")(df(9))
    assert(b ne a)
    assert(memo.get(spark, "/x")(fail("still warm")) eq a)
  }
}
