package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding-damage detectors — the UTF-8 hygiene screen an LLM-curation
  * pipeline runs before any text-quality scoring (a document full of
  * mojibake or stripped control bytes poisons tokenizers and dedup alike;
  * C4/RefinedWeb drop such pages outright). Reference-domain motivation:
  * the reference ingests third-party JSON verbatim (no byte hygiene at
  * all — `/root/reference/scripts/ingest.py` trusts the HTTP payload), so
  * this is the gate it was missing.
  *
  * All three detectors are single regex counts (codegen'd `RegExpCount`,
  * map-side only — the census aggregation is the only shuffle in q193):
  *
  *  - [[CtrlPattern]]: C0/DEL control characters EXCLUDING tab/newline/CR
  *    (legitimate in text) — their presence means binary spill or a
  *    charset-decode gone wrong.
  *  - [[ReplacementPattern]]: U+FFFD REPLACEMENT CHARACTER — a decoder
  *    already met an invalid byte sequence and said so.
  *  - [[MojibakePattern]]: the UTF-8-read-as-Latin-1 double-decode
  *    signature. A UTF-8 lead byte decoded as Latin-1 yields Ã/Â/â
  *    (U+00C2–U+00C3, U+00E2) followed by a continuation byte decoded
  *    into U+0080–U+00BF (or the quote/dagger range Windows-1252 maps
  *    them to) — e.g. "é" → "Ã©", "'" → "â€™". Matching the two-char
  *    bigram, not the bare lead char, keeps legitimate French/Portuguese
  *    "Ã" out of the count.
  *
  * Patterns are Java-regex/RE2 common syntax (`\x{…}` code points, no
  * lookaround), so the DuckDB oracle runs the IDENTICAL pattern text —
  * the census is oracle-checkable character for character. */
object EncodingDamage {

  /** C0 controls minus \t \n \r, plus DEL. */
  val CtrlPattern = "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}]"

  /** U+FFFD — the decoder's own damage report. */
  val ReplacementPattern = "\\x{FFFD}"

  /** Latin-1-decoded UTF-8 lead byte + continuation-range follower. */
  val MojibakePattern =
    "[\\x{00C2}\\x{00C3}\\x{00E2}][\\x{0080}-\\x{00BF}\\x{2013}-\\x{2122}]"

  def ctrlCount(c: Column): Column = regexp_count(c, lit(CtrlPattern))
  def replacementCount(c: Column): Column =
    regexp_count(c, lit(ReplacementPattern))
  def mojibakeCount(c: Column): Column =
    regexp_count(c, lit(MojibakePattern))

  /** Any damage at all — the drop predicate a curation pass filters on. */
  def isDamaged(c: Column): Column =
    (ctrlCount(c) + replacementCount(c) + mojibakeCount(c)) > 0
}
