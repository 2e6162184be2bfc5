package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The distributed BPE training loop against a sequential reference
  * implementation (same semantics, plain Scala): identical merge
  * sequences, identical final symbol tables, deterministic across
  * partitionings, and the deployed encoder reproduces training. */
class BpeTrainerSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential reference: word-freq map, per round count all adjacent
    * positions weighted by freq, pick (count desc, a asc, b asc), merge
    * greedily left-to-right with a skip. */
  private def referenceTrain(words: Map[String, Long],
      rounds: Int): (Map[String, (List[String], Long)],
        List[(String, String, Long)]) = {
    var tbl = words.map { case (w, f) =>
      w -> (w.toList.map(_.toString), f)
    }
    var merges = List.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      tbl.values.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case List(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges :+= (a, b, c)
        def mergeWord(s: List[String]): List[String] = s match {
          case x :: y :: rest if x == a && y == b =>
            (a + b) :: mergeWord(rest)
          case x :: rest => x :: mergeWord(rest)
          case Nil => Nil
        }
        tbl = tbl.map { case (w, (syms, f)) => w -> (mergeWord(syms), f) }
        r += 1
      }
    }
    (tbl, merges)
  }

  private def docsOf(texts: Seq[String]) = texts.toDF("text")

  private def wordFreqs(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

  test("distributed merges == sequential reference on a mixed fixture, " +
    "including overlap (aaa) and tie-break cases") {
    val texts = Seq(
      "aaa aaa abab low lower lowest",
      "abab abab newer newest low low",
      "aaa banana bandana newer")
    val (wordsDf, merges) = BpeTrainer.train(docsOf(texts), "text", 8)
    val (refTbl, refMerges) = referenceTrain(wordFreqs(texts), 8)
    assert(merges.map(m => (m.a, m.b, m.count)) == refMerges,
      s"merge sequences diverge:\n dist=$merges\n ref =$refMerges")
    val dist = wordsDf.collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Seq[String]]("symbols").toList,
          r.getAs[Long]("freq"))).toMap
    assert(dist == refTbl, s"final symbol tables diverge:\n$dist\n$refTbl")
  }

  test("training is deterministic across shuffle-partition counts") {
    val texts = Seq("spark scala spark shuffle shuffle shuffle",
      "scala sort spark merge merge")
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    val a = BpeTrainer.train(docsOf(texts), "text", 6)._2
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = BpeTrainer.train(docsOf(texts), "text", 6)._2
      assert(a == b, s"partitioning changed the merges: $a vs $b")
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("on real documents: symbol mass shrinks every round, vocab " +
    "grows by exactly the merged symbol, early-stop only when no pairs") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val (words0, _) = BpeTrainer.train(docs, "text", 1)
    val (wordsK, merges) = BpeTrainer.train(docs, "text", 6)
    assert(merges.length == 6, "the corpus cannot run dry in 6 rounds")
    assert(merges.map(m => (m.a, m.b)).distinct.length == 6,
      "the same pair must never be chosen twice (it no longer exists)")
    def mass(df: org.apache.spark.sql.DataFrame) = df
      .agg(sum(size(col("symbols")) * col("freq"))).head().getLong(0)
    assert(mass(wordsK) < mass(words0),
      "six merges must shrink weighted symbol mass below one merge's")
    // every learned symbol is the concatenation of its parents, and the
    // final table only contains symbols derivable from chars + merges
    val learned = merges.map(m => m.a + m.b).toSet
    val finalSyms = wordsK.select(explode(col("symbols")).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(finalSyms.filter(_.length > 1).forall(learned.contains),
      s"multi-char symbol not explained by the merge list: " +
        s"${finalSyms.filter(_.length > 1) -- learned}")
  }

  test("encode() reproduces the trained table's segmentation and runs " +
    "on unseen text (per-word stateless deployment)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val (wordsK, merges) = BpeTrainer.train(docs, "text", 5)
    // encoding each distinct training word must give exactly its final
    // symbols — the encoder IS the training fold replayed
    val encoded = BpeTrainer
      .encode(wordsK.select(col("word").as("text"), col("symbols")),
        "text", merges)
      .select(col("symbols"), element_at(col("pieces"), 1).as("enc"))
    assert(encoded.filter(col("symbols") =!= col("enc")).count() == 0,
      "encoder disagrees with training segmentation")
    // unseen word: segments greedily with learned symbols, no failure
    val unseen = BpeTrainer.encode(Seq("zzzqq").toDF("text"), "text",
      merges).select(element_at(col("pieces"), 1)).head().getSeq[String](0)
    assert(unseen.mkString == "zzzqq",
      "encoding must preserve the word's characters")
  }

  // ---- batched training: merge-for-merge ≡ sequential (r15 item 2) ----

  /** Fixtures chosen so top census pairs INTERACT: chained symbols
    * (every pair shares a letter with the next-ranked one, forcing
    * deferrals/stops), overlap runs (aaa), ties, and a concat-collision
    * path (merges mint "ab"/"bc", later candidates touch them). */
  private val interactingFixtures = Seq(
    Seq("aaa aaa abab low lower lowest",
      "abab abab newer newest low low",
      "aaa banana bandana newer"),
    // chain a-b-c-d-e: (a,b) (b,c) (c,d) (d,e) all interact pairwise
    Seq("abcde abcde abcde bcd bcd cde", "ab bc cd de abc abcd"),
    // collision course: "ab" minted early, then words where symbol 'a'
    // precedes minted "ab" contexts and ("a","b") concat re-appears
    Seq("ab ab ab ab aab aab aabb abb", "ba ba baa bab bab bab"),
    // heavy ties: equal-frequency disjoint pairs + shared-letter spoilers
    Seq("xy xy uv uv pq pq xu yv", "xy uv pq qp vx yu"))

  test("batched training picks the exact sequential merge sequence on " +
    "interacting fixtures (deferral-forcing), for every batch size") {
    for (texts <- interactingFixtures; b <- Seq(2, 3, 8)) {
      val seq = BpeTrainer.train(docsOf(texts), "text", 10)
      val bat = BpeTrainer.train(docsOf(texts), "text", 10, batch = b)
      assert(bat._2 == seq._2,
        s"batch=$b diverged on $texts:\n bat=${bat._2}\n seq=${seq._2}")
      val tbl = (df: org.apache.spark.sql.DataFrame) => df.collect()
        .map(r => r.getAs[String]("word") ->
          r.getAs[Seq[String]]("symbols").toList).toMap
      assert(tbl(bat._1) == tbl(seq._1),
        s"batch=$b final symbol tables diverge on $texts")
    }
  }

  test("batched == sequential under randomized small-alphabet stress " +
    "(collision- and interaction-dense corpora)") {
    // a 3-letter alphabet makes pair interactions and concat collisions
    // the COMMON case rather than a crafted one: merged symbols like
    // "ab"/"ba"/"aa" keep re-entering the census as operands, every
    // deferral/stop/trim rule in selectBatch fires repeatedly. Corpora
    // are seeded-deterministic (no Math.random — repeatable failures).
    def lcg(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(s => (s * 6364136223846793005L + 1442695040888963407L)).drop(1)
    for (seed <- Seq(7L, 23L, 101L, 555L)) {
      val rnd = lcg(seed)
      val words = Seq.fill(24) {
        val len = 2 + math.floorMod(rnd.next(), 6L).toInt
        (0 until len).map(_ =>
          "abc".charAt(math.floorMod(rnd.next(), 3L).toInt)).mkString
      }
      val freqs = words.map(w => s"$w " * (1 + math.floorMod(rnd.next(), 5L).toInt))
      val texts = freqs.grouped(6).map(_.mkString(" ")).toSeq
      val seq = BpeTrainer.train(docsOf(texts), "text", 12)
      for (b <- Seq(2, 5)) {
        val bat = BpeTrainer.train(docsOf(texts), "text", 12, batch = b)
        assert(bat._2 == seq._2,
          s"seed=$seed batch=$b diverged:\n bat=${bat._2}\n seq=${seq._2}")
      }
      // the sequential reference agrees too (ties, overlaps, dry-out)
      val (_, refMerges) = referenceTrain(wordFreqs(texts), 12)
      assert(seq._2.map(m => (m.a, m.b, m.count)) == refMerges,
        s"seed=$seed distributed != reference:\n ${seq._2}\n $refMerges")
    }
  }

  test("batched == sequential on the real sf0.001 corpus (q370's input)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val seq = BpeTrainer.train(docs, "text", 6)._2
    val bat = BpeTrainer.train(docs, "text", 6, batch = 8)._2
    assert(bat == seq, s"corpus divergence:\n bat=$bat\n seq=$seq")
  }

  test("affected-word pruning: the round rewrite touches only words " +
    "containing a selected pair, and skipping changes nothing") {
    // 'qq qq qq' dominates so (q,q) is the first merge; the zz/ww words
    // never contain it and must ride the untouched side of every round
    val texts = Seq("qq qq qq qq zz zz ww", "qq qq zz ww ww")
    val seen = scala.collection.mutable.ListBuffer[(Int, Long, Long)]()
    val (wp, mp) = BpeTrainer.train(docsOf(texts), "text", 2,
      probe = Some((r, a, t) => seen += ((r, a, t))))
    assert(seen.nonEmpty, "probe must fire once per merge round")
    seen.foreach { case (r, affected, total) =>
      assert(affected >= 1L && affected < total,
        s"round $r rewrote $affected of $total words — pruning must " +
          s"skip the words that cannot contain the selected pair")
    }
    // and the pruned path is value-identical to an unpruned reference
    val (refTbl, refMerges) = referenceTrain(wordFreqs(texts), 2)
    assert(mp.map(m => (m.a, m.b, m.count)) == refMerges)
    val tbl = wp.collect().map(r => r.getAs[String]("word") ->
      (r.getAs[Seq[String]]("symbols").toList, r.getAs[Long]("freq")))
      .toMap
    assert(tbl == refTbl, s"pruned table diverges:\n$tbl\n$refTbl")
  }

  test("selectBatch: prefix stops at the first conflict, trims emergent " +
    "ties, and selects a colliding head solo") {
    import BpeTrainer.{selectBatch, Merge}
    val top = Seq(Merge("a", "b", 100), Merge("c", "d", 80),
      Merge("x", "a", 70), Merge("e", "f", 60))
    // (x,a) shares 'a' with the selected head → stop there; trim keeps
    // (c,d) because 80 > 70
    assert(selectBatch(top, 4, windowFull = false, Set.empty) ==
      Seq(Merge("a", "b", 100), Merge("c", "d", 80)))
    // equal counts at the stop boundary: (c,d,70) ties the stopper — an
    // emergent pair could tie it too, so it must be trimmed
    val tied = Seq(Merge("a", "b", 100), Merge("c", "d", 70),
      Merge("x", "a", 70))
    assert(selectBatch(tied, 4, windowFull = false, Set.empty) ==
      Seq(Merge("a", "b", 100)))
    // a head whose concat already exists as a vocab symbol goes solo
    assert(selectBatch(top, 4, windowFull = false, Set("ab")) ==
      Seq(Merge("a", "b", 100)))
    // a LATER collision ends the batch before the colliding candidate
    assert(selectBatch(top, 4, windowFull = false, Set("cd")) ==
      Seq(Merge("a", "b", 100)))
    // budget-stop: unseen next candidate's count bounds the trim
    val sparseTop = Seq(Merge("a", "b", 100), Merge("c", "d", 80),
      Merge("e", "f", 80))
    assert(selectBatch(sparseTop, 2, windowFull = false, Set.empty) ==
      Seq(Merge("a", "b", 100)),
      "(c,d,80) must be trimmed: the unseen (e,f,80) ties it")
    // exhausted census, window not full: nothing unseen, keep everything
    assert(selectBatch(sparseTop, 4, windowFull = false, Set.empty) ==
      sparseTop)
  }
}
