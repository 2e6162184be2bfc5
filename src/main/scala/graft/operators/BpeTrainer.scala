package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Distributed BPE tokenizer training — the iterative half of the
  * tokenizer-prep surface (q359 censuses merge candidates for ONE
  * round; this runs the actual Sennrich-style training loop at corpus
  * scale and returns the merge list a tokenizer ships).
  *
  * Shape per round (all corpus-scale work stays distributed):
  *   1. adjacent-pair census over the WORD-FREQUENCY table — one
  *      map-side-combined aggregation; the table is vocabulary-scale
  *      (distinct words × freq), never corpus-scale, because BPE
  *      statistics are invariant to where a word occurs.
  *   2. argmax pair under the deterministic (count desc, a, b) order —
  *      a 1-row TakeOrdered collect. One driver round-trip per round is
  *      the irreducible cost of a sequential decision process (the
  *      KMeans/CC scheduler-floor argument); the collected value is ONE
  *      merge rule, bounded by `rounds`, never data.
  *   3. greedy left-to-right merge of the chosen pair inside every
  *      word's symbol array — a codegen'd `aggregate` fold with a skip
  *      flag (consumed positions can't re-match: 'aaa' + (a,a) → [aa,a]).
  *      The round result is eagerly localCheckpoint'd so each round's
  *      plan is a LEAF (the ConnectedComponents lineage-re-anchoring
  *      rule: without it the driver re-analyzes a per-round-growing
  *      tree), and the previous round's blocks are released.
  *
  * Ties and order are fully deterministic, so the merge sequence is
  * identical across runs, partitionings, and engines — BpeTrainerSpec
  * pins the distributed loop against a sequential reference
  * implementation and across shuffle-partition counts. */
object BpeTrainer {

  /** One learned merge rule: `a`+`b` → `a+b`, chosen at `count`
    * weighted adjacent occurrences. */
  final case class Merge(a: String, b: String, count: Long)

  /** Adjacent symbol pairs of `s` as structs (a, b); empty for
    * single-symbol words. The `size >= 2` guard matters: Spark's
    * `sequence(1, 0)` counts DOWN ([1, 0]), it does not return empty. */
  private def adjPairs(s: Column): Column =
    when(size(s) >= 2,
      transform(sequence(lit(1), size(s) - 1),
        i => struct(element_at(s, i).as("a"),
          element_at(s, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Greedy left-to-right merge of (a, b) → ab inside a symbol array —
    * an `aggregate` fold over positions carrying (output, skip): a
    * matched position appends the merged symbol and skips its partner,
    * so overlapping candidates resolve exactly like the sequential
    * scan ('aaa' with (a,a) → [aa, a], never [a, aa] or [aa, aa]).
    * Arrays shorter than a pair return unchanged — the guard matters
    * for the EMPTY array `encode` can see on whitespace-only text,
    * where `sequence(1, 0)` would count DOWN and index position 0. */
  private[graft] def mergeGreedy(s: Column, a: String, b: String): Column =
    when(size(s) < 2, s).otherwise(mergeFold(s, a, b))

  private def mergeFold(s: Column, a: String, b: String): Column =
    aggregate(
      sequence(lit(1), size(s)),
      struct(array().cast("array<string>").as("out"),
        lit(false).as("skip")),
      (acc, i) => {
        val cur = element_at(s, i)
        val isMerge = !acc.getField("skip") && (i < size(s)) &&
          cur === lit(a) && element_at(s, i + 1) === lit(b)
        struct(
          when(acc.getField("skip"), acc.getField("out"))
            .when(isMerge, array_append(acc.getField("out"), lit(a + b)))
            .otherwise(array_append(acc.getField("out"), cur)).as("out"),
          when(acc.getField("skip"), lit(false)).otherwise(isMerge)
            .as("skip"))
      },
      acc => acc.getField("out"))

  /** The word-frequency table seeded with character symbols:
    * (word, symbols, freq). Vocabulary-scale. */
  private def seedWords(docsDf: DataFrame, textCol: String): DataFrame =
    docsDf
      .select(explode(TextAnalysis.tokensCol(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"),
        filter(split(col("word"), ""), c => c =!= "").as("symbols"),
        col("freq"))

  /** Train `rounds` merges over the corpus behind `textCol`.
    * @return (final word table (word, symbols, freq) — already
    *         materialized via localCheckpoint, and the ordered merge
    *         list). Stops early when no pair remains (every word fully
    *         merged to one symbol). */
  def train(docsDf: DataFrame, textCol: String,
      rounds: Int): (DataFrame, Seq[Merge]) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var words = seedWords(docsDf, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer[Merge]()
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val best = words
        .select(col("freq"), explode(adjPairs(col("symbols"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, cnt) = (best.head.getAs[String]("a"),
          best.head.getAs[String]("b"), best.head.getAs[Long]("cnt"))
        merges += Merge(a, b, cnt)
        val prev = words
        words = words
          .select(col("word"),
            mergeGreedy(col("symbols"), a, b).as("symbols"), col("freq"))
          .localCheckpoint(true)
        // release the superseded round's blocks — the new checkpoint is
        // already materialized, nothing reads the old one again
        CheckpointBlocks.release(prev)
        r += 1
      }
    }
    (words, merges.toList)
  }

  /** Re-bind an expression as a LAMBDA VARIABLE before fanning it out:
    * `mergeGreedy` references its input ~6 times, so naively folding k
    * merge levels duplicates the child subtree 6^k times — at k = 5
    * that is a ~10⁴-node expression whose analysis/codegen GC-thrashes
    * the driver (observed: the encode spec hung the full suite). Routing
    * each level through `transform(array(child), lvl -> f(lvl))` makes
    * every self-reference a leaf variable, so the tree grows LINEARLY
    * in the merge count. */
  private def bound(child: Column)(f: Column => Column): Column =
    element_at(transform(array(child), lvl => f(lvl)), 1)

  /** Deploy the trained tokenizer: segment `textCol`'s words with the
    * learned merges, returning the input plus a `pieces` column
    * (Array[Array[String]] — per word, its BPE symbols). Each merge
    * level is [[bound]], so the expression stays linear in the merge
    * count. Encoding is per-word stateless, so it runs identically on a
    * batch frame or a foreachBatch micro-batch. */
  def encode(df: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame =
    df.withColumn("pieces",
      transform(TextAnalysis.tokensCol(col(textCol)), w =>
        merges.foldLeft(filter(split(w, ""), c => c =!= "")) {
          (symbols, m) => bound(symbols)(lvl => mergeGreedy(lvl, m.a, m.b))
        }))
}
