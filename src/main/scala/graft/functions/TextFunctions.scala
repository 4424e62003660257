package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface: tokenizing,
  * shingling, language ID, quality scoring, fingerprinting. All pure column
  * expressions (codegen-friendly, no UDFs) with exact DuckDB-SQL
  * equivalents so every derived metric is oracle-checkable.
  *
  * Determinism notes:
  *  - tokenization is a single regexp split on non-alphanumerics, empties
  *    dropped — `regexp_split_to_array` + `list_filter` reproduces it in
  *    DuckDB exactly.
  *  - all ratios computed in Double with the same operand order.
  */
object TextFunctions {

  /** Lowercased word tokens; empty strings removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Whitespace-delimited token count (the cheap "how many words" measure). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish sub-word proxy: ceil(chars/4) is the industry rule-of-thumb
    * for byte-pair-encoded token estimates on English text. */
  def approxBpeTokenCount(text: Column): Column =
    ceil(length(text).cast("double") / lit(4.0)).cast("long")

  /** Character n-gram shingles (distinct, order-insensitive set).
    * Empty/short strings yield an empty array (sequence(1,0) is empty). */
  def charShingles(text: Column, n: Int): Column = {
    // Same lambda-recompute hazard as wordShingles: `s.substr(i, n)`
    // inside a transform lambda would re-lowercase the whole string per
    // element (O(len²) per row). Split to a char array once, then zip
    // shifted slices — lambda touches only its struct variable.
    // split("", -1) keeps a trailing empty string — slice to exactly
    // length(text) chars
    val chars = slice(split(lower(text), ""), lit(1), length(text))
    val m = greatest(size(chars) - (n - 1), lit(0))
    val zipped = arrays_zip((0 until n).map(j => slice(chars, lit(j + 1), m)): _*)
    array_distinct(
      transform(zipped, s =>
        concat((0 until n).map(j => s.getField(j.toString)): _*)))
  }

  /** Word w-shingles over [[tokens]] (distinct). w consecutive tokens
    * joined by a single space. */
  def wordShingles(text: Column, w: Int): Column = {
    val ts = tokens(text)
    // Shape matters: referencing `ts` INSIDE a transform lambda would
    // re-evaluate the whole tokenization (regexp split) once per element
    // per reference — measured 10x slowdown. arrays_zip of w shifted
    // slices evaluates `ts` only as lambda-free arguments (per row), and
    // the lambda touches nothing but its own struct variable.
    val n = greatest(size(ts) - (w - 1), lit(0))
    val zipped = arrays_zip((0 until w).map(j => slice(ts, lit(j + 1), n)): _*)
    array_distinct(
      transform(zipped, s =>
        concat_ws(" ", (0 until w).map(j => s.getField(j.toString)): _*)))
  }

  /** Word w-shingles WITH duplicates (occurrence list, not a set) —
    * the input to repetition statistics, where multiplicity is the
    * signal. Same zip-of-slices shape as [[wordShingles]]. */
  def wordShinglesAll(text: Column, w: Int): Column = {
    val ts = tokens(text)
    val n = greatest(size(ts) - (w - 1), lit(0))
    val zipped = arrays_zip((0 until w).map(j => slice(ts, lit(j + 1), n)): _*)
    transform(zipped, s =>
      concat_ws(" ", (0 until w).map(j => s.getField(j.toString)): _*))
  }

  /** Stopword-hit count over a small english stopword list — the classic
    * cheap language-ID / quality signal. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "this")

  def stopwordCount(text: Column): Column = stopwordCountFromTokens(tokens(text))

  /** Stopword hits over a PRE-TOKENIZED array column — use this (and the
    * other `FromTokens` variants) whenever several metrics share one
    * document: Catalyst's projection collapse has no CSE, so each
    * text-based variant re-runs the regexp tokenization per reference
    * (the measured ~12x recompute in the round-2 q20 plan). */
  def stopwordCountFromTokens(ts: Column): Column =
    size(filter(ts, t => t.isin(EnglishStopwords.map(x => x: Any): _*)))

  /** Stopword ratio in Double (0 when no tokens). */
  def stopwordRatio(text: Column): Column = stopwordRatioFromTokens(tokens(text))

  /** Stopword ratio from a pre-tokenized array (0 when no tokens). */
  def stopwordRatioFromTokens(ts: Column): Column =
    when(size(ts) === 0, 0.0)
      .otherwise(stopwordCountFromTokens(ts).cast("double") / size(ts).cast("double"))

  /** Ratio of non-alphanumeric, non-space chars to total chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = length(regexp_replace(text, "[a-zA-Z0-9 ]", ""))
    when(total === 0, 0.0).otherwise(punct.cast("double") / total.cast("double"))
  }

  /** Mean token length in chars (0 when no tokens). */
  def meanTokenLen(text: Column): Column = meanTokenLenFromTokens(tokens(text))

  /** Mean token length from a pre-tokenized array (0 when no tokens). */
  def meanTokenLenFromTokens(ts: Column): Column =
    when(size(ts) === 0, 0.0).otherwise(
      aggregate(ts, lit(0.0), (acc, t) => acc + length(t).cast("double"))
        / size(ts).cast("double"))

  /** Heuristic language ID: stopword-ratio driven (the reference corpus is
    * English/other). Returns "en" when enough English stopwords are present,
    * "unknown" otherwise. A deliberately simple, fully-SQL-expressible
    * heuristic (n-gram LMs need model weights we cannot ship offline). */
  def langIdHeuristic(text: Column): Column = langIdFromRatio(stopwordRatio(text))

  /** Language ID from a precomputed (UNROUNDED) stopword ratio. */
  def langIdFromRatio(swr: Column): Column =
    when(swr >= 0.08, lit("en")).otherwise(lit("unknown"))

  /** Composite quality score in [0,1]:
    * 0.4 * saturating-length + 0.3 * stopword presence + 0.3 * (1 - punct).
    * All components deterministic Doubles.
    */
  def qualityScore(text: Column): Column =
    qualityScoreFrom(length(text), stopwordRatio(text), punctRatio(text))

  /** Quality score from precomputed components: char count, UNROUNDED
    * stopword ratio, UNROUNDED punct ratio — same formula, same operand
    * order, so the result is bit-identical to [[qualityScore]]. */
  def qualityScoreFrom(nChars: Column, swr: Column, punct: Column): Column = {
    val lenScore = least(nChars.cast("double") / lit(500.0), lit(1.0))
    val swScore = least(swr / lit(0.2), lit(1.0))
    val punctScore = lit(1.0) - least(punct * lit(4.0), lit(1.0))
    lit(0.4) * lenScore + lit(0.3) * swScore + lit(0.3) * punctScore
  }

  /** Rolling polynomial fingerprint of the token stream (a Rabin-Karp
    * style document fingerprint): fold tokens with
    * acc = (acc * 31 + h(token)) mod 2^31-1. Order-sensitive (unlike
    * the minhash sketch) so it distinguishes permuted documents. The
    * modulus keeps every intermediate < 2^36, so Int64 arithmetic is exact
    * and identical in DuckDB. */
  def docFingerprint(text: Column): Column = docFingerprintFromTokens(tokens(text))

  /** Fingerprint from a pre-tokenized array — same fold, same modulus. */
  def docFingerprintFromTokens(ts: Column): Column = {
    val M = 2147483647L // 2^31 - 1, Mersenne prime
    aggregate(
      ts,
      lit(0L),
      (acc, t) => (acc * 31 + HashFunctions.hash60(t) % M) % M
    )
  }
}
