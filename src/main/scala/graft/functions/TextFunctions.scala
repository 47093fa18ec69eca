package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text functions, all built from codegen'd Catalyst built-ins
  * (no UDFs in the hot path — every function here stays inside
  * WholeStageCodegen).
  *
  * Tokenizer semantics mirror the reference's Go tokenizer
  * (`/root/reference/plugins/wc/wc.go:12-14`: split on every non-letter rune,
  * lowercase, drop empties — Go's `strings.FieldsFunc` never emits empty
  * tokens, while Spark's `split` does on leading/trailing delimiters, hence
  * the explicit empty filter; see SURVEY.md §7.4.5).
  */
object TextFunctions {

  /** Lowercased letter-run tokens of `text`, empty tokens dropped.
    * `[^\p{L}]+` == Go `unicode.IsLetter` complement (SURVEY.md §7.3). */
  def tokenize(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}]+"), w => length(w) > 0)

  /** Distinct tokens (set semantics, unordered). */
  def tokenSet(text: Column): Column = array_distinct(tokenize(text))

  /** Word-level n-gram shingles of the token sequence, space-joined.
    * Empty array when the document has fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val ws = tokenize(text)
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct n-gram shingles (set semantics). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Normalization used for exact dedup: collapse whitespace runs, trim,
    * lowercase — so formatting-only variants hash identically. */
  def normalizeText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** 128-bit content fingerprint of the normalized text (hex string). */
  def fingerprintMd5(text: Column): Column = md5(normalizeText(text))

  /** Number of whitespace-delimited tokens. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), w => length(w) > 0)).cast("bigint")

  /** Scala-side tokenizer, bit-identical to `tokenize` (used by the typed
    * MapReduce API and tests). */
  def tokenizeScala(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}]+").filter(_.nonEmpty)

  /** BPE-ish subword token estimate: each word contributes ceil(len/4)
    * pieces — a cheap deterministic stand-in for a real BPE vocabulary that
    * still scales with morpheme count rather than word count. */
  def bpeTokenCount(text: Column): Column =
    aggregate(
      tokenize(text),
      lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("bigint"))
}
