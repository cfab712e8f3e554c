package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a string's UTF-8 bytes —
  * `compressed_len / raw_len` (0.0 for empty input; a TOTAL function so the
  * codegen path stays primitive-double with no null bookkeeping).
  *
  * The classic model-free gibberish/boilerplate signal: repeated filler
  * compresses far below prose (ratio → 0), while random/base64 blobs sit
  * above it (ratio → 1+); curation pipelines cut both tails. Complements
  * [[graft.operators.TextAnalysis.withCharEntropy]] — entropy sees only the
  * unigram char distribution, DEFLATE's LZ77 window also sees repeated
  * SUBSTRINGS, so a doc that cycles a 40-char slogan scores ~uniform on
  * entropy but collapses under deflate.
  *
  * Level 6 (zlib default), nowrap (no 6-byte header bias), one pass,
  * deterministic for a given input. Runs as a real codegen'd kernel — the
  * generated code calls the same static method as the interpreted path.
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DeflateRatioKernel.ratio($s);")

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatioKernel.ratio(input.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
}

/** Static kernel shared by [[DeflateRatio]]'s interpreted eval and its
  * generated code.
  */
object DeflateRatioKernel {
  // one native zlib stream + scratch buffer per executor thread, reused via
  // reset() — per-row Deflater construction is a native init/teardown that
  // would dominate the cost of compressing typical documents. Never end()d:
  // the thread-local lives for the executor thread's lifetime, so native
  // memory is bounded by the thread count, not the row count.
  private val local =
    new ThreadLocal[(java.util.zip.Deflater, Array[Byte])] {
      override def initialValue(): (java.util.zip.Deflater, Array[Byte]) =
        (new java.util.zip.Deflater(6, true), new Array[Byte](8192))
    }

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0.0
    val (d, buf) = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}
