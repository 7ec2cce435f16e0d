package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators (SURVEY.md
  * §7.4): tokenization, shingling, normalization, fingerprinting, marker
  * scoring. All pure `Column` expressions — codegen'd, no UDFs — so they
  * inline into whole-stage codegen and stay cheap at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed (split on `\s+` leaves a
    * leading "" for texts starting with whitespace).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** The engine-portable 52-bit deterministic hash: first 13 hex chars
    * of md5("<seed>:<id>") as a non-negative BIGINT — computable
    * byte-identically in DuckDB as
    * `CAST('0x' || substr(md5(seed || ':' || id), 1, 13) AS BIGINT)`.
    * Shared by the 13-hex-char sites (weighted sampling's u-draw, the
    * pack cells) so that shape has ONE Scala definition; the shuffle
    * order (full md5 hex string) and the classifier's quality-weighted
    * split (8-hex / 2^32 variant) are deliberate different shapes with
    * their own oracle twins — each oracle string spells its SQL twin,
    * pinned by its own hash row.
    */
  def portableHash52(seed: String, id: Column): Column =
    conv(substring(md5(concat_ws(":", lit(seed), id)), 1, 13), 16, 10)
      .cast("long")

  /** Word n-gram shingles from a MATERIALIZED token-array column:
    * `["a b c", "b c d", ...]`. Empty array for docs shorter than n
    * tokens.
    *
    * The column passed here must be a real attribute (select `tokens()`
    * into a column first), not the `tokens(text)` expression itself: a
    * Column expression referenced inside the transform lambda is
    * re-evaluated on every element access, turning shingling into
    * O(tokens²) regex splits per document (measured 15s vs 1s on 6k
    * docs).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    // guard, not greatest(): sequence(1, 0) yields the DESCENDING array
    // [1, 0] (Spark infers step -1) and element_at(toks, 0) then throws —
    // docs shorter than n tokens must short-circuit to an empty array
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Character n-gram shingles over the raw text. Same short-text guard
    * as [[shinglesFromTokens]]: greatest(...,0) would hand sequence a
    * (1, 0) range, which Spark fills DESCENDING as [1, 0] — two spurious
    * shingles for text shorter than n instead of none.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Canonical form for exact-dedup fingerprinting: lowercase, all
    * non-alphanumerics stripped.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** 128-bit content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** How many of the document's tokens appear in `markers`. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit): _*)))

  /** Language-ID marker sets (n-gram/stopword heuristic). CJK presence is
    * scored separately via a codepoint-range count.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "es" -> Seq("el", "los", "que", "y", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
}
