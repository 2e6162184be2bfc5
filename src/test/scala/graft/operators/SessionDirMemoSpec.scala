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

  test("an evicted build a caller still holds keeps its checkpoint " +
    "blocks and stays readable (ADVICE r13 — eager unpersist would " +
    "hard-fail a live reader of a lineage-truncated checkpoint)") {
    val memo = new SessionDirMemo
    def ckpt(tag: Int) = df(tag).localCheckpoint(true)
    def blocksOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      }.toSet
    val a = memo.get(spark, "/a")(ckpt(10))
    val b = memo.get(spark, "/b")(ckpt(11))
    memo.get(spark, "/a")(fail("warm")) // /b becomes LRU
    memo.get(spark, "/c")(ckpt(12))     // evicts /b — but we still hold b
    assert(memo.parkedCount == 1)
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(blocksOf(b).forall(persisted.contains),
      "a still-held evicted frame lost its blocks — live reader broken")
    assert(b.count() == 11, "the held evicted frame must remain readable")
    assert(blocksOf(a).forall(persisted.contains),
      "kept slot /a lost its blocks to the eviction")
  }

  test("a DERIVED frame keeps an evicted build alive even after the " +
    "wrapper Dataset is dropped — the real consumer shape (every " +
    "caller .selects off the memoized frame immediately)") {
    val memo = new SessionDirMemo
    def ckpt(tag: Int) = df(tag).localCheckpoint(true)
    // build, derive, and DROP the wrapper — only the derived plan lives
    val derived = memo.get(spark, "/b")(ckpt(11))
      .select((org.apache.spark.sql.functions.col("id") * 2).as("id2"))
    memo.get(spark, "/a")(ckpt(10))
    memo.get(spark, "/c")(ckpt(12)) // evicts /b; only `derived` refers
    var tries = 0
    while (tries < 5) { System.gc(); Thread.sleep(30)
      memo.sweepNow(); tries += 1 }
    assert(memo.parkedCount == 1,
      "sweep released a build a derived reader still needs — the " +
        "WeakReference must target the checkpoint leaf, not the wrapper")
    assert(derived.count() == 11,
      "the derived frame over the evicted build must remain readable")
  }

  test("once the evicted frame is unreachable, the next memo access " +
    "sweeps its blocks — bounded retention without breaking readers") {
    val memo = new SessionDirMemo
    def ckpt(tag: Int) = df(tag).localCheckpoint(true)
    var b: org.apache.spark.sql.DataFrame =
      memo.get(spark, "/b")(ckpt(11))
    val bBlocks = b.queryExecution.logical.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.toSet
    memo.get(spark, "/a")(ckpt(10))
    memo.get(spark, "/c")(ckpt(12)) // evicts /b into the parking lot
    assert(memo.parkedCount == 1)
    b = null // drop the last strong reference to the evicted frame
    // WeakReference clearing needs a GC cycle; retry a few times — the
    // reference is small and young, so one or two collections suffice.
    var tries = 0
    while (memo.parkedCount > 0 && tries < 20) {
      System.gc(); Thread.sleep(50); memo.sweepNow(); tries += 1
    }
    assert(memo.parkedCount == 0,
      "the unreachable evicted build was never swept")
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(bBlocks.forall(!persisted.contains(_)),
      "swept build's checkpoint blocks were not unpersisted")
  }

  test("multi-frame values (SessionDirMemoOf) park EVERY member frame " +
    "on eviction and sweep each once unreachable — a k-means fit's " +
    "centroids AND assignment") {
    val memo = new SessionDirMemoOf[
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
      p => Seq(p._1, p._2))
    def ckpt(tag: Int) = df(tag).localCheckpoint(true)
    def blocksOf(d: org.apache.spark.sql.DataFrame) =
      d.queryExecution.logical.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      }.toSet
    val a = memo.get(spark, "/a")((ckpt(10), ckpt(11)))
    var b: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
      memo.get(spark, "/b")((ckpt(12), ckpt(13)))
    val bBlocks = blocksOf(b._1) ++ blocksOf(b._2)
    memo.get(spark, "/a")(fail("warm")) // /b becomes LRU
    memo.get(spark, "/c")((ckpt(14), ckpt(15))) // evicts /b
    assert(memo.parkedCount == 2, "both member frames must be parked")
    b = null
    var tries = 0
    while (memo.parkedCount > 0 && tries < 20) {
      System.gc(); Thread.sleep(50); memo.sweepNow(); tries += 1
    }
    assert(memo.parkedCount == 0)
    val persisted = spark.sparkContext.getPersistentRDDs.keySet
    assert(bBlocks.forall(!persisted.contains(_)),
      "a swept tuple member's checkpoint blocks were not unpersisted")
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
