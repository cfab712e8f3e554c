package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (the MOSS scheme) as a one-pass kernel: md5 every
  * char k-gram of the (pre-normalized) input, then the MINIMUM hash of each
  * sliding window of `w` consecutive gram hashes, distinct, in first-
  * occurrence order. Guarantee: two strings sharing any exact substring of
  * length ≥ w + k - 1 share a fingerprint (winnowing theorem,
  * alignment-free).
  *
  * The HOF encoding ([[graft.operators.TextAnalysis.winnowFingerprintsHof]])
  * is O(n·w) with an array copy per window position; this kernel is O(n)
  * amortized via a monotonic deque (classic sliding-window minimum), with
  * the md5 digester reused across grams. Both emit the VALUE of the window
  * minimum, so tie-breaking cannot diverge; equivalence is pinned in
  * KernelSpec and the DuckDB oracle replays the HOF formula.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"need k>=2, w>=1; got k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints requires string, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowKernel.fingerprints($s, $k, $w);")

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** Static kernel shared by [[WinnowFingerprints]]'s interpreted eval and its
  * generated code.
  */
object WinnowKernel {

  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  def fingerprints(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    // CODE-POINT (not UTF-16 unit, not byte) windows: Spark substr/length and
    // DuckDB substr both count Unicode code points, and the HOF twin + oracle
    // must see identical grams — a supplementary-plane char (emoji) is ONE
    // position, so Java String.substring indexing would diverge on it
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[AnyRef])
    val m = n - k + 1 // gram count
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[String](m)
    var i = 0
    while (i < m) {
      hashes(i) = md5Hex(md, new String(cps, i, k))
      i += 1
    }
    // sliding-window minimum via monotonic deque of indices (values
    // strictly increasing front→back); >= pop keeps the leftmost of equal
    // minima, which emits the same VALUE either way
    val deque = new java.util.ArrayDeque[Integer](w)
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i < m) {
      while (!deque.isEmpty && hashes(deque.peekLast) .compareTo(hashes(i)) >= 0)
        deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst <= i - w) deque.pollFirst()
      if (i >= w - 1) seen.add(hashes(deque.peekFirst))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}
