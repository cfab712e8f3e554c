package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text kernels of the reference, re-expressed as native Catalyst `Column`
  * expression trees (codegen-friendly, no UDFs, no Python-worker boundary).
  *
  * Reference semantics: tokenize /root/reference/src/utils.py:32-41,
  * k-shingles /root/reference/src/minhash_utils.py:6-20.
  */
object TextFunctions {

  /** lower → punctuation→space → collapse whitespace → trim → split on ' '.
    *
    * Deliberate deviation: ASCII `\w` (Java regex default, == DuckDB/RE2)
    * instead of Python's Unicode-aware `\w`, so the DuckDB oracle matches
    * bit-for-bit (SURVEY.md §7.5). A Unicode mode would add `(?U)`.
    * Text that normalizes to nothing yields `[]` — the reference's no-arg
    * `.split()` (/root/reference/src/utils.py:41) returns `[]` on empty
    * input, so punctuation-only docs have zero tokens, not one empty token.
    */
  def tokenize(text: Column): Column = tokenize(text, unicode = false)

  /** `unicode = true` restores the reference's Python-`re` semantics
    * (Unicode-aware `\w`, so accented/CJK letters survive) via the Java
    * regex `(?U)` flag. Not oracle-checkable — DuckDB's RE2 `\w` is ASCII.
    */
  def tokenize(text: Column, unicode: Boolean): Column = {
    val flag = if (unicode) "(?U)" else ""
    // array_remove drops the lone "" that split() yields on empty input —
    // after collapse+trim no interior empty tokens can exist.
    array_remove(
      split(
        trim(regexp_replace(regexp_replace(lower(text), s"$flag[^\\w\\s]", " "), s"$flag\\s+", " ")),
        " "),
      "")
  }

  /** The normalization underlying [[tokenize]], exposed as its own kernel:
    * lower → punctuation→space → collapse whitespace → trim. Same ASCII
    * `\w` dialect caveat as tokenize.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^\\w\\s]", " "), "\\s+", " "))

  /** ALL k-token windows (non-distinct, in order) — the multiset variant of
    * [[kShingles]] for occurrence-counting operators (repetition metrics);
    * dedup-oriented callers want the distinct form.
    */
  def kShinglesAll(tokens: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    when(size(tokens) >= k,
      transform(sequence(lit(0), size(tokens) - k),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct k-token shingles in first-occurrence order. Each shingle is the
    * space-joined token window — order-isomorphic to the reference's tuple
    * representation because ' ' (0x20) sorts below every `\w` character, so
    * lexicographic order on joined strings equals element-wise tuple order.
    * Docs with fewer than k tokens produce an empty array (the reference
    * later crashes on these; we define them away — SURVEY.md §7.5).
    */
  def kShingles(tokens: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    when(size(tokens) >= k,
      array_distinct(transform(sequence(lit(0), size(tokens) - k),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(k))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Full text → distinct k-shingles pipeline. */
  def shingles(text: Column, k: Int): Column = kShingles(tokenize(text), k)

  /** Character n-grams (for n-gram Jaccard dedup): distinct sliding windows
    * of n characters over the normalized text. Custom expression — the HOF
    * form re-evaluates the normalization once per window (see [[CharNGrams]]).
    */
  def charNGrams(text: Column, n: Int): Column = {
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      CharNGrams(org.apache.spark.sql.graftshim.ColumnBridge.expression(norm), n))
  }

  /** HOF twin of [[charNGrams]], kept for cross-checks. */
  def charNGramsHof(text: Column, n: Int): Column = {
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    when(length(norm) >= n,
      array_distinct(transform(sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
}
