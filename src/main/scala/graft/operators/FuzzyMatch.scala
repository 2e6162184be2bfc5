package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SymSpell-style fuzzy matching: all unordered pairs of distinct strings
  * within edit (Levenshtein) distance 1, via a keyed self-join — no
  * all-pairs product, and no Levenshtein evaluation at all.
  *
  * Each string is expanded into its position-tagged deletion neighborhood:
  * the intact string at pos 0, plus every single-character-deletion variant
  * tagged with the deleted index. Candidates equi-join on the variant
  * string; a three-clause integer filter then decides distance ≤ 1 EXACTLY:
  *
  *  - '''same variant, same deletion position j > 0''': both strings equal
  *    after removing index j, so they differ at most at index j — one
  *    substitution (distance 0 pairs are excluded by the `<` ordering,
  *    assuming distinct inputs);
  *  - '''one side at pos 0''': the other string's deletion equals the
  *    intact string verbatim — one insertion/deletion.
  *
  * Completeness: a substitution pair shares the variant at the substituted
  * index (same j on both sides); an indel pair joins intact-vs-deleted.
  * Soundness: equal remainders at the same index force equality everywhere
  * else, and a verbatim deletion match is distance 1 by construction.
  * Distance-2 bucket-mates — e.g. "abc"/"cab", which share bare variant
  * "ab" at different positions — die on the integer compare. The naive
  * formulation (bare variant keys + post-join `levenshtein` over every
  * candidate) was the round-6 bench's slowest single step: ~1M candidate
  * Levenshteins at sf0.1. The filter here is three long compares.
  *
  * Scale shape: O(N · len) variant rows, one equi-join keyed on short
  * strings, one dedup exchange. No state grows with N², and every join
  * strategy (broadcast / sort-merge / AQE skew split) applies to the
  * variant key.
  */
object FuzzyMatch {

  /** All pairs (a, b) with a < b (lexicographic) and edit distance ≤ 1.
    * `strings` must expose column `colName`; values are assumed distinct
    * (dedup first otherwise — equal values would pair at distance 0).
    * Output columns: `a`, `b`. */
  def editDistance1Pairs(strings: DataFrame, colName: String): DataFrame = {
    // adaptive fan-out (r20, guide §2.5): the deletion-neighborhood
    // explode fuses onto the scan's map stage — one partition on a
    // one-row-group fixture file; no-op at real split counts.
    val v = ReadParallelism
      .fanOut(strings.select(col(colName).as("name")), col("name"))
      .select(col("name"), explode(expr(
      """transform(sequence(0, length(name)), i ->
        |  struct(i AS pos,
        |    CASE WHEN i = 0 THEN name
        |         ELSE concat(substring(name, 1, i - 1),
        |                     substring(name, i + 1, length(name))) END AS key))"""
        .stripMargin)).as("v"))
      .select(col("name"), col("v.pos").as("pos"), col("v.key").as("key"))
    v.as("a")
      .join(v.as("b"),
        col("a.key") === col("b.key") && col("a.name") < col("b.name"))
      .filter(col("a.pos") === col("b.pos") ||
        col("a.pos") === 0 || col("b.pos") === 0)
      .select(col("a.name").as("a"), col("b.name").as("b"))
      .distinct() // a pair can match through several shared variants
  }
}
