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
    *
    * ASCII mode runs as a custom one-pass kernel ([[TokenizeAscii]]): the
    * chain (lower → `[^\w\s]`→' ' → `\s+`→' ' → trim → split → drop "")
    * reduces exactly to "maximal runs of `[a-zA-Z0-9_]`, A-Z lowercased" —
    * every other byte (incl. every byte of a multi-byte UTF-8 char, none of
    * which is ASCII `\w`) is a separator either via the punctuation replace
    * or the whitespace split. One byte scan replaces two regex passes per
    * row on the hottest input path of the engine; the regex chain is kept
    * for unicode mode and as the equivalence-test twin
    * ([[tokenizeRegexTwin]], pinned ≡ kernel in KernelSpec).
    */
  def tokenize(text: Column, unicode: Boolean): Column =
    if (unicode) tokenizeRegexTwin(text, unicode = true)
    else org.apache.spark.sql.graftshim.ColumnBridge.column(
      TokenizeAscii(org.apache.spark.sql.graftshim.ColumnBridge.expression(text)))

  /** The original regex-chain encoding — unicode mode's implementation and
    * the ASCII kernel's cross-check twin.
    */
  def tokenizeRegexTwin(text: Column, unicode: Boolean): Column = {
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
    * `\w` dialect caveat as tokenize. Implemented as the tokens re-joined
    * with single spaces — the same function, through the one-pass kernel
    * instead of two regex executions. The isNotNull guard preserves
    * null-in/null-out (the regex chain's and the oracle's semantics):
    * Spark's `concat_ws` SKIPS a null array and would map NULL → "".
    */
  def normalize(text: Column): Column =
    when(text.isNotNull, concat_ws(" ", tokenize(text)))

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

  /** DEFLATE compressed/raw byte ratio — see [[DeflateRatio]]. */
  def deflateRatio(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      DeflateRatio(org.apache.spark.sql.graftshim.ColumnBridge.expression(text)))

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

/** One-pass ASCII tokenizer: maximal runs of `[a-zA-Z0-9_]` with A-Z
  * lowercased — provably equivalent to the regex chain (see
  * [[TextFunctions.tokenize]] scaladoc), 2 regex passes cheaper per row.
  * Byte-wise scan is correct because every token byte is single-byte ASCII
  * and every byte of a multi-byte UTF-8 char is ≥ 0x80 (a separator).
  */
case class TokenizeAscii(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_ascii"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize_ascii requires string, got ${other.catalogString}")
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenizeAsciiKernel.tokenize($s);")

  override protected def nullSafeEval(input: Any): Any =
    TokenizeAsciiKernel.tokenize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): TokenizeAscii =
    copy(child = c)
}

/** Static kernel shared by [[TokenizeAscii]]'s interpreted eval and its
  * generated code.
  */
object TokenizeAsciiKernel {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  def tokenize(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](16)
    var i = 0
    var start = -1
    var needsLower = false
    while (i <= n) {
      val b = if (i < n) bytes(i) & 0xFF else 0
      val isToken = i < n &&
        ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') || b == '_')
      if (isToken) {
        if (start < 0) { start = i; needsLower = false }
        if (b >= 'A' && b <= 'Z') needsLower = true
      } else if (start >= 0) {
        val tok = java.util.Arrays.copyOfRange(bytes, start, i)
        if (needsLower) {
          var k = 0
          while (k < tok.length) {
            val c = tok(k) & 0xFF
            if (c >= 'A' && c <= 'Z') tok(k) = (c + 32).toByte
            k += 1
          }
        }
        out.add(UTF8String.fromBytes(tok))
        start = -1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
