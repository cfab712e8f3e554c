package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over an `array<string>` token column, as a custom Catalyst
  * `Expression` (a single per-row pass beats a 64-lambda higher-order-function
  * encoding by ~two orders of magnitude).
  *
  * Semantics (Charikar 2002): per token t, h = xxhash64(t) (Spark's own
  * XxHash64Function, seed 42 — bit-identical to `functions.xxhash64`); for
  * each bit j accumulate +1 if set else -1; output bit j = (sum_j >= 0).
  * Empty token array hashes to all-bits-set (every counter is 0 >= 0),
  * which is fine: two empty docs are identical, hamming = 0.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // real codegen (same bit-for-bit loop as nullSafeEval): XXH64 is the
  // static Java class Spark's own xxhash64 codegen calls, so the generated
  // projection stays inside whole-stage codegen in the pair-scoring joins
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val res = ctx.freshName("res")
      s"""
        int[] $counts = new int[64];
        int $n = $a.numElements();
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
            long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            for (int $j = 0; $j < 64; $j++) {
              if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
            }
          }
        }
        long $res = 0L;
        for (int $k = 0; $k < 64; $k++) {
          if ($counts[$k] >= 0) $res |= (1L << $k);
        }
        ${ev.value} = $res;
      """
    })

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) >= 0) res |= (1L << j)
      j += 1
    }
    res
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** md5-mode SimHash: per token, the first 8 bytes of md5(token) supply the
  * 64 bit weights; output is the 16-hex-char majority fingerprint. Slower
  * than [[SimHash64]] (a full digest per token) but — like the md5 MinHash
  * mode — every engine with an md5() can recompute it, so the kernel is
  * DuckDB-oracle-checkable bit for bit. Empty arrays yield all-ones
  * ("ffffffffffffffff": every zero count is >= 0), matching [[SimHash64]].
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_md5"

  @transient private lazy val digestLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = digestLocal.get()
    val scratch = new Array[Byte](16)
    // counts indexed by (hex nibble position i in 0..15) * 4 + (bit b in 0..3)
    val counts = new Array[Int](64)
    var k = 0
    val n = arr.numElements()
    while (k < n) {
      if (!arr.isNullAt(k)) {
        md.reset()
        md.update(arr.getUTF8String(k).getBytes)
        md.digest(scratch, 0, 16)
        var i = 0
        while (i < 16) {
          val v = if ((i & 1) == 0) (scratch(i >> 1) >>> 4) & 0xF
                  else scratch(i >> 1) & 0xF
          var b = 0
          while (b < 4) {
            if (((v >> b) & 1) == 1) counts(i * 4 + b) += 1
            else counts(i * 4 + b) -= 1
            b += 1
          }
          i += 1
        }
      }
      k += 1
    }
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) {
      var nib = 0
      var b = 0
      while (b < 4) {
        if (counts(i * 4 + b) >= 0) nib |= (1 << b)
        b += 1
      }
      out(i) = hexChars(nib).toByte
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column API: simhash64(tokens). */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Column API: md5-mode oracle-checkable simhash (16-hex-char string). */
  def simhashMd5(tokens: Column): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(tokens)))

  /** Hamming distance between two simhash values — pure built-ins. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
