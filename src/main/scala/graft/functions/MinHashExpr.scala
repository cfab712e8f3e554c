package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature expressions.
  *
  * The higher-order-function encoding
  * `transform(sequence(0,H-1), h -> array_min(transform(shingles, s -> hash(h,s))))`
  * re-evaluates the inner `transform` — including any inlined upstream
  * expression — once per signature slot, and pays a boxed lambda call per
  * element. These expressions walk the shingle array once, updating all H
  * running minima in a primitive loop.
  *
  * Hash semantics are bit-identical to the HOF encodings (asserted by
  * KernelSpec and the DuckDB oracle):
  *  - md5 mode:  sig[h] = min over s of md5(h.toString ++ s), 32-hex-char
  *    lowercase strings, unsigned byte-wise min == lexicographic min.
  *  - xx mode:   sig[h] = min over s of xxhash64(h: int, xxhash64(s)), i.e.
  *    Spark's XXH64 chain with seed 42, signed min (a fixed total order —
  *    valid MinHash — parity with the reference not claimed in this mode).
  * Empty shingle arrays yield null (reference crashes there:
  * /root/reference/src/minhash_utils.py:66,81).
  */
case class MinHashMd5Signature(child: Expression, numHash: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val hashPrefixes: Array[Array[Byte]] =
    Array.tabulate(numHash)(h => h.toString.getBytes("UTF-8"))

  @transient private lazy val digestLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = hexChars(bytes(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** unsigned byte-wise comparison — equals lexicographic order of the
    * fixed-width hex encoding.
    */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xFF
      val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = digestLocal.get()
    // digest into a reused scratch buffer: md.digest() would allocate a
    // fresh 16-byte array per (shingle × slot) call — numHash × |shingles|
    // young-gen garbage per row on the hottest loop of the engine. Minima
    // are copied out only when they improve (rare after warm-up).
    val scratch = new Array[Byte](16)
    val mins = new Array[Array[Byte]](numHash)
    var i = 0
    while (i < n) {
      val sBytes = arr.getUTF8String(i).getBytes
      var h = 0
      while (h < numHash) {
        md.reset()
        md.update(hashPrefixes(h))
        md.update(sBytes)
        md.digest(scratch, 0, 16)
        if (mins(h) == null) mins(h) = java.util.Arrays.copyOf(scratch, 16)
        else if (lessThan(scratch, mins(h))) System.arraycopy(scratch, 0, mins(h), 0, 16)
        h += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](numHash)
    var h = 0
    while (h < numHash) {
      out(h) = toHex(mins(h))
      h += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinHashMd5Signature =
    copy(child = c)
}

case class MinHashXxSignature(child: Expression, numHash: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_xx"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_xx requires array<string>, got ${other.catalogString}")
  }

  // real codegen (one static call into the shared kernel) so the fast-mode
  // index build stays inside whole-stage codegen — the loop is pure long
  // arithmetic, unlike the digest-bound md5 kernel where a fallback is
  // justified. The kernel returns null for empty arrays, so the generated
  // code re-checks isNull after the call.
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinHashXxKernel.sig($a, $numHash);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def nullSafeEval(input: Any): Any =
    MinHashXxKernel.sig(input.asInstanceOf[ArrayData], numHash)

  override protected def withNewChildInternal(c: Expression): MinHashXxSignature =
    copy(child = c)
}

/** Static kernel shared by [[MinHashXxSignature]]'s interpreted eval and its
  * generated code. Semantics unchanged from the CodegenFallback version:
  * sig[h] = min over shingles s of xxhash64(h: int, xxhash64(s)), Spark's
  * XXH64 chain seeded 42, signed min; empty array ⇒ null. The per-slot
  * seeds xxhash64(h) depend only on (h, 42) — cached per numHash so the
  * hot loop is one hashLong per (shingle × slot).
  */
object MinHashXxKernel {
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def seeds(numHash: Int): Array[Long] =
    seedCache.computeIfAbsent(numHash,
      (n: Integer) => Array.tabulate(n)(h => XXH64.hashInt(h, 42L)))

  def sig(arr: ArrayData, numHash: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val slotSeeds = seeds(numHash)
    val mins = new Array[Long](numHash)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // base = xxhash64(s): one string hash per shingle, reused by all slots
      val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var h = 0
      while (h < numHash) {
        val v = XXH64.hashLong(base, slotSeeds(h))
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashExpr {
  def minhashMd5(shingles: Column, numHash: Int): Column =
    ColumnBridge.column(MinHashMd5Signature(ColumnBridge.expression(shingles), numHash))
  def minhashXx(shingles: Column, numHash: Int): Column =
    ColumnBridge.column(MinHashXxSignature(ColumnBridge.expression(shingles), numHash))
}
