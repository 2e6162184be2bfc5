package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for large-scale training-data pipelines:
  * token counting, quality scoring, n-gram-heuristic language ID, and
  * document fingerprinting.
  *
  * Everything here is a pure Catalyst expression tree over built-in
  * functions — codegen'd, shuffle-free, and therefore embarrassingly
  * parallel at 100 TB (per-row work only; no UDF serialization cost).
  * Formulas are deliberately mirror-able in ANSI SQL so every derived
  * query can be DuckDB-oracle-checked.
  */
object TextAnalysis {

  /** Whitespace-collapsed, trimmed, lower-cased canonical form. */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Number of non-whitespace token runs (BPE-ish pre-tokenization count). */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\S+"), lit(0))).cast("long")

  /** Count of matches of an arbitrary word-class regex. */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Function-word profiles per language — the single source of truth for
    * langId and the language-count queries (q32 references these, so the
    * heuristic can't drift from the reported counts). */
  val languageProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|to|and|in|is|it)\\b",
    "es" -> "\\b(el|la|de|que|y|en|los|un)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|nicht)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|dans)\\b")

  private val profileMap = languageProfiles.toMap
  private val enStops = profileMap("en")
  private val esStops = profileMap("es")
  private val deStops = profileMap("de")
  private val frStops = profileMap("fr")

  /** Stopword-hit ratio for a language profile (n-gram heuristic stand-in:
    * function-word unigrams are the strongest cheap signal). */
  def stopwordRatio(c: Column, pattern: String = enStops): Column =
    matchCount(lower(c), pattern).cast("double") /
      greatest(tokenCount(c), lit(1L)).cast("double")

  /** Ratio of alphabetic characters to all characters. */
  def alphaRatio(c: Column): Column =
    length(regexp_replace(c, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Composite quality score in [0,1]: 0.4·stopword + 0.3·alpha + 0.3·length.
    * Same shape as published heuristic quality filters (length/punct/stopword
    * ratios) used in LLM pretraining corpora cleaning. */
  def qualityScore(c: Column): Column = {
    val toks = tokenCount(c).cast("double")
    lit(0.4) * stopwordRatio(c) + lit(0.3) * alphaRatio(c) +
      lit(0.3) * least(lit(1.0), toks / lit(100.0))
  }

  /** Language ID by arg-max of per-language function-word hit counts, with a
    * deterministic >=-chain tie-break (en > es > de > fr). */
  def langId(c: Column): Column = {
    val l = lower(c)
    val en = matchCount(l, enStops)
    val es = matchCount(l, esStops)
    val de = matchCount(l, deStops)
    val fr = matchCount(l, frStops)
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Content fingerprint of the normalized text (exact-dup key). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Tokens of the normalized text as an array column. Materialize this in
    * a projection BEFORE building n-grams: lambda bodies in higher-order
    * functions re-evaluate captured expressions per element, so slicing a
    * pre-computed array column is O(n) per doc while slicing
    * `split(regexp_replace(...))` inline is O(n · regex).
    *
    * Equally important: consume the n-gram expression DIRECTLY in the next
    * projection (`explode(ngramsFromTokens(toks, n))`, `size(...)`) rather
    * than aliasing the gram array in its own intermediate projection first.
    * The three-projection shape (tokens → grams alias → explode) lets the
    * optimizer merge the gram array into the generator while re-inlining
    * the token split into the lambda — measured ~9× slower on the shingle
    * pipelines. Two projections: tokens, then whatever consumes the grams. */
  def tokensCol(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Distinct word n-grams from a materialized tokens array column; empty
    * if fewer than n tokens. */
  def ngramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-grams of the normalized text (convenience form — for
    * hot paths project `tokensCol` first and use `ngramsFromTokens`). */
  def wordNgrams(c: Column, n: Int): Column =
    ngramsFromTokens(tokensCol(c), n)

  /** Distinct word n-grams as 64-bit hashes: xxhash64 over the token slice
    * skips building a per-gram string when only gram IDENTITY matters
    * (grouping / document frequency), not the text — measurably cheaper to
    * generate and the shuffle carries 8-byte longs instead of gram strings.
    * 64-bit collisions are negligible below ~10⁹ distinct grams; beyond
    * that, widen the key to (hash, first-token) or a 128-bit hash. */
  /** The BPE-ish pre-tokenization piece pattern (GPT-2-style without the
    * RE2-incompatible lookahead): contractions, letter runs, digit runs,
    * punctuation runs. ONE definition — q45 (piece counts), q230
    * (fertility), and q318 (coverage audit) all claim to measure the
    * SAME tokenizer, so they must share its pattern or silently drift. */
  val bpePiecePattern: String =
    "'(s|d|m|t|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s']+"

  /** DuckDB single-quoted literal form of [[bpePiecePattern]] (embedded
    * quotes doubled; the regex itself is identical). */
  val bpePiecePatternSql: String =
    "'''(s|d|m|t|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s'']+'"

  def hashedNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => xxhash64(slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<long>"))
}
