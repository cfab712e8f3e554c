package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams (first-occurrence order) as a custom
  * expression. The HOF encoding
  * `transform(sequence(1, length(norm)-n+1), i -> norm.substr(i, n))`
  * inlines the normalization expression INSIDE the lambda, so the
  * regex-normalize re-runs once per n-gram (~500× per document — measured
  * 25s for the sf0.1 corpus vs ~1s here). As a UnaryExpression the
  * normalized child is evaluated exactly once per row.
  * Windows are char-indexed over UTF8String — same semantics as Spark's
  * `substr` and DuckDB's `t[i:j]` slicing (the oracle twin).
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    // One O(len) pass records every char-start byte offset; windows are
    // then zero-copy byte-range views. substringSQL would re-scan from
    // byte 0 on every call to find the char position — O(len²) per doc,
    // the dominant cost for multi-KB documents.
    val bytes = s.getBytes
    val offs = new Array[Int](len + 1)
    var ci = 0
    var bi = 0
    while (ci < len) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(len) = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i)))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(c: Expression): CharNGrams =
    copy(child = c)
}
