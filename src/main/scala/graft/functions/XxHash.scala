package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM ports of the public xxHash spec: XXH32 and XXH3-128 ("xxh128").
  *
  * These exist for BIT-PARITY with the reference's DEFAULT hash family
  * (/root/reference/src/utils.py:13-16 — `xxhash.xxh128(f"{seed}{x}",
  * seed=1).intdigest()` for MinHash slots; utils.py:44-47 —
  * `xxhash.xxh32(repr(band), seed=1)` for band buckets). The engine's md5
  * mode is bit-exact with the reference's md5 option; this module closes the
  * remaining gap for its default mode. No dependencies: the algorithms are
  * implemented from the public xxHash specification; the 192-byte XXH3
  * default secret below is the spec's kSecret constant. KernelSpec
  * cross-validates both functions against two INDEPENDENT implementations
  * already on the Spark classpath (lz4-java's XXHash32 and parquet-column's
  * shaded openhft XXH3) across all algorithm length branches.
  */
object XxHashKernel {

  // ---------------- XXH32 ----------------
  private final val P32_1 = 0x9E3779B1
  private final val P32_2 = 0x85EBCA77
  private final val P32_3 = 0xC2B2AE3D
  private final val P32_4 = 0x27D4EB2F
  private final val P32_5 = 0x165667B1

  @inline private def rl32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  @inline private def rl64(b: Array[Byte], i: Int): Long =
    (rl32(b, i) & 0xFFFFFFFFL) | ((rl32(b, i + 4) & 0xFFFFFFFFL) << 32)

  /** XXH32 one-shot; returns the 32-bit hash as an UNSIGNED value in a Long. */
  def xxh32(buf: Array[Byte], off: Int, len: Int, seed: Int): Long = {
    var idx = off
    val end = off + len
    var h = 0
    if (len >= 16) {
      val limit = end - 16
      var v1 = seed + P32_1 + P32_2
      var v2 = seed + P32_2
      var v3 = seed
      var v4 = seed - P32_1
      while (idx <= limit) {
        v1 = Integer.rotateLeft(v1 + rl32(buf, idx) * P32_2, 13) * P32_1
        v2 = Integer.rotateLeft(v2 + rl32(buf, idx + 4) * P32_2, 13) * P32_1
        v3 = Integer.rotateLeft(v3 + rl32(buf, idx + 8) * P32_2, 13) * P32_1
        v4 = Integer.rotateLeft(v4 + rl32(buf, idx + 12) * P32_2, 13) * P32_1
        idx += 16
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else h = seed + P32_5
    h += len
    while (idx + 4 <= end) {
      h = Integer.rotateLeft(h + rl32(buf, idx) * P32_3, 17) * P32_4
      idx += 4
    }
    while (idx < end) {
      h = Integer.rotateLeft(h + (buf(idx) & 0xFF) * P32_5, 11) * P32_1
      idx += 1
    }
    h ^= h >>> 15; h *= P32_2; h ^= h >>> 13; h *= P32_3; h ^= h >>> 16
    h & 0xFFFFFFFFL
  }

  // ---------------- XXH3-128 ----------------
  private final val P64_1 = 0x9E3779B185EBCA87L
  private final val P64_2 = 0xC2B2AE3D27D4EB4FL
  private final val P64_3 = 0x165667B19E3779F9L
  private final val P64_4 = 0x85EBCA77C2B2AE63L
  private final val P64_5 = 0x27D4EB2F165667C5L
  private final val MX1 = 0x165667919E3779F9L
  private final val MX2 = 0x9FB21C651E98DF25L

  /** The public spec's 192-byte default secret (kSecret). */
  private val kSecret: Array[Byte] = {
    val hex = "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f" +
      "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c" +
      "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8" +
      "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364" +
      "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e" +
      "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e"
    Array.tabulate(192)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  @inline private def umulHigh(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  @inline private def mul128Fold64(a: Long, b: Long): Long =
    (a * b) ^ umulHigh(a, b)

  @inline private def avalanche64(h0: Long): Long = {
    var h = h0 ^ (h0 >>> 33); h *= P64_2; h ^= h >>> 29; h *= P64_3; h ^ (h >>> 32)
  }

  @inline private def avalanche3(h0: Long): Long = {
    var h = h0 ^ (h0 >>> 37); h *= MX1; h ^ (h >>> 32)
  }

  /** XXH3-128 one-shot. Returns (low64, high64); the canonical 128-bit
    * integer — what Python xxhash's intdigest() yields — is
    * high64 * 2^64 + low64 (both unsigned).
    */
  def xxh128(input: Array[Byte], off: Int, len: Int, seed: Long): (Long, Long) = {
    if (len <= 16) len0to16(input, off, len, seed)
    else if (len <= 128) len17to128(input, off, len, seed)
    else if (len <= 240) len129to240(input, off, len, seed)
    else hashLong(input, off, len, seed)
  }

  private def len0to16(in: Array[Byte], off: Int, len: Int, seed: Long): (Long, Long) = {
    if (len > 8) {
      // 9..16
      val bitflipl = (rl64(kSecret, 32) ^ rl64(kSecret, 40)) - seed
      val bitfliph = (rl64(kSecret, 48) ^ rl64(kSecret, 56)) + seed
      val inputLo = rl64(in, off)
      var inputHi = rl64(in, off + len - 8)
      val mixed = inputLo ^ inputHi ^ bitflipl
      var mLow = mixed * P64_1
      var mHigh = umulHigh(mixed, P64_1)
      mLow += (len - 1).toLong << 54
      inputHi ^= bitfliph
      mHigh += inputHi + (inputHi & 0xFFFFFFFFL) * ((P32_2 & 0xFFFFFFFFL) - 1)
      mLow ^= java.lang.Long.reverseBytes(mHigh)
      val hLow = mLow * P64_2
      val hHigh = umulHigh(mLow, P64_2) + mHigh * P64_2
      (avalanche3(hLow), avalanche3(hHigh))
    } else if (len >= 4) {
      // 4..8
      val s = seed ^ ((Integer.reverseBytes(seed.toInt).toLong & 0xFFFFFFFFL) << 32)
      val inputLo = rl32(in, off) & 0xFFFFFFFFL
      val inputHi = rl32(in, off + len - 4) & 0xFFFFFFFFL
      val input64 = inputLo + (inputHi << 32)
      val bitflip = (rl64(kSecret, 16) ^ rl64(kSecret, 24)) + s
      val keyed = input64 ^ bitflip
      val mult = P64_1 + (len.toLong << 2)
      var mLow = keyed * mult
      var mHigh = umulHigh(keyed, mult)
      mHigh += mLow << 1
      mLow ^= mHigh >>> 3
      mLow ^= mLow >>> 35; mLow *= MX2; mLow ^= mLow >>> 28
      (mLow, avalanche3(mHigh))
    } else if (len > 0) {
      // 1..3
      val c1 = in(off) & 0xFF
      val c2 = in(off + (len >> 1)) & 0xFF
      val c3 = in(off + len - 1) & 0xFF
      val combinedl = (c1 << 16) | (c2 << 24) | c3 | (len << 8)
      val combinedh = Integer.rotateLeft(Integer.reverseBytes(combinedl), 13)
      val bitflipl = ((rl32(kSecret, 0) ^ rl32(kSecret, 4)) & 0xFFFFFFFFL) + seed
      val bitfliph = ((rl32(kSecret, 8) ^ rl32(kSecret, 12)) & 0xFFFFFFFFL) - seed
      (avalanche64((combinedl & 0xFFFFFFFFL) ^ bitflipl),
        avalanche64((combinedh & 0xFFFFFFFFL) ^ bitfliph))
    } else {
      (avalanche64(seed ^ rl64(kSecret, 64) ^ rl64(kSecret, 72)),
        avalanche64(seed ^ rl64(kSecret, 80) ^ rl64(kSecret, 88)))
    }
  }

  @inline private def mix16B(in: Array[Byte], i: Int, sOff: Int, seed: Long): Long =
    mul128Fold64(
      rl64(in, i) ^ (rl64(kSecret, sOff) + seed),
      rl64(in, i + 8) ^ (rl64(kSecret, sOff + 8) - seed))

  // acc = (low, high); returns updated pair
  @inline private def mix32B(accLow: Long, accHigh: Long, in: Array[Byte],
      i1: Int, i2: Int, sOff: Int, seed: Long): (Long, Long) = {
    var lo = accLow + mix16B(in, i1, sOff, seed)
    lo ^= rl64(in, i2) + rl64(in, i2 + 8)
    var hi = accHigh + mix16B(in, i2, sOff + 16, seed)
    hi ^= rl64(in, i1) + rl64(in, i1 + 8)
    (lo, hi)
  }

  @inline private def finalizeMid(accLow: Long, accHigh: Long, len: Int, seed: Long): (Long, Long) = {
    val low = avalanche3(accLow + accHigh)
    val high = 0L - avalanche3(
      accLow * P64_1 + accHigh * P64_4 + (len.toLong - seed) * P64_2)
    (low, high)
  }

  private def len17to128(in: Array[Byte], off: Int, len: Int, seed: Long): (Long, Long) = {
    var lo = len.toLong * P64_1
    var hi = 0L
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          val r = mix32B(lo, hi, in, off + 48, off + len - 64, 96, seed); lo = r._1; hi = r._2
        }
        val r = mix32B(lo, hi, in, off + 32, off + len - 48, 64, seed); lo = r._1; hi = r._2
      }
      val r = mix32B(lo, hi, in, off + 16, off + len - 32, 32, seed); lo = r._1; hi = r._2
    }
    val r = mix32B(lo, hi, in, off, off + len - 16, 0, seed); lo = r._1; hi = r._2
    finalizeMid(lo, hi, len, seed)
  }

  private def len129to240(in: Array[Byte], off: Int, len: Int, seed: Long): (Long, Long) = {
    val nbRounds = len / 32
    var lo = len.toLong * P64_1
    var hi = 0L
    var i = 0
    while (i < 4) {
      val r = mix32B(lo, hi, in, off + 32 * i, off + 32 * i + 16, 32 * i, seed)
      lo = r._1; hi = r._2
      i += 1
    }
    lo = avalanche3(lo); hi = avalanche3(hi)
    while (i < nbRounds) {
      // XXH3_MIDSIZE_STARTOFFSET = 3
      val r = mix32B(lo, hi, in, off + 32 * i, off + 32 * i + 16, 3 + 32 * (i - 4), seed)
      lo = r._1; hi = r._2
      i += 1
    }
    // last 32 bytes, reversed halves, negated seed;
    // secret offset = SECRET_SIZE_MIN(136) - MIDSIZE_LASTOFFSET(17) - 16 = 103
    val r = mix32B(lo, hi, in, off + len - 16, off + len - 32, 103, 0L - seed)
    finalizeMid(r._1, r._2, len, seed)
  }

  @inline private def accumulate512(acc: Array[Long], in: Array[Byte], iOff: Int,
      secret: Array[Byte], sOff: Int): Unit = {
    var i = 0
    while (i < 8) {
      val dataVal = rl64(in, iOff + 8 * i)
      val dataKey = dataVal ^ rl64(secret, sOff + 8 * i)
      acc(i ^ 1) += dataVal
      acc(i) += (dataKey & 0xFFFFFFFFL) * (dataKey >>> 32)
      i += 1
    }
  }

  private def hashLong(in: Array[Byte], off: Int, len: Int, seed: Long): (Long, Long) = {
    val secret =
      if (seed == 0L) kSecret
      else {
        val cs = new Array[Byte](192)
        var i = 0
        while (i < 12) {
          writeLE64(cs, 16 * i, rl64(kSecret, 16 * i) + seed)
          writeLE64(cs, 16 * i + 8, rl64(kSecret, 16 * i + 8) - seed)
          i += 1
        }
        cs
      }
    val acc = Array(P32_3 & 0xFFFFFFFFL, P64_1, P64_2, P64_3,
      P64_4, P32_2 & 0xFFFFFFFFL, P64_5, P32_1 & 0xFFFFFFFFL)
    val nbStripesPerBlock = (192 - 64) / 8 // 16
    val blockLen = 64 * nbStripesPerBlock  // 1024
    val nbBlocks = (len - 1) / blockLen
    var n = 0
    while (n < nbBlocks) {
      var s = 0
      while (s < nbStripesPerBlock) {
        accumulate512(acc, in, off + n * blockLen + s * 64, secret, s * 8)
        s += 1
      }
      // scramble
      var i = 0
      while (i < 8) {
        acc(i) ^= acc(i) >>> 47
        acc(i) ^= rl64(secret, 192 - 64 + 8 * i)
        acc(i) *= P32_1 & 0xFFFFFFFFL
        i += 1
      }
      n += 1
    }
    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    var s = 0
    while (s < nbStripes) {
      accumulate512(acc, in, off + nbBlocks * blockLen + s * 64, secret, s * 8)
      s += 1
    }
    // last stripe: secret offset = 192 - 64 - 7 (SECRET_LASTACC_START)
    accumulate512(acc, in, off + len - 64, secret, 192 - 64 - 7)

    def mergeAccs(sOff: Int, start: Long): Long = {
      var result = start
      var i = 0
      while (i < 4) {
        result += mul128Fold64(
          acc(2 * i) ^ rl64(secret, sOff + 16 * i),
          acc(2 * i + 1) ^ rl64(secret, sOff + 16 * i + 8))
        i += 1
      }
      avalanche3(result)
    }
    // low merges at secret+11 (SECRET_MERGEACCS_START); high mirrors from the end
    (mergeAccs(11, len.toLong * P64_1),
      mergeAccs(192 - 64 - 11, ~(len.toLong * P64_2)))
  }

  @inline private def writeLE64(b: Array[Byte], i: Int, v: Long): Unit = {
    var k = 0
    while (k < 8) { b(i + k) = (v >>> (8 * k)).toByte; k += 1 }
  }

  // ---------------- reference hash-family composition ----------------

  /** Python's hex() of the unsigned 128-bit (high, low): "0x" + lowercase
    * hex, NO leading zeros (reference stores signatures exactly so,
    * minhash_utils.py:81-87).
    */
  def pyHex(low: Long, high: Long): UTF8String =
    UTF8String.fromString(
      if (high == 0L) "0x" + java.lang.Long.toHexString(low)
      else "0x" + java.lang.Long.toHexString(high) + f"$low%016x")

  /** MinHash signature over vocab indices (or shingle strings), reference
    * default hash family: slot h of element x = xxh128(bytes(s"$h$x"),
    * seed=1).intdigest(); per-slot UNSIGNED 128-bit min; output = Python
    * hex() strings. Empty array ⇒ null (reference crashes there).
    * `isLong` selects the element accessor (vocab path: long indices —
    * Python str(int) and Long.toString agree; direct path: shingle strings).
    */
  def minhashSig(arr: ArrayData, numHash: Int, isLong: Boolean): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val minLow = new Array[Long](numHash)
    val minHigh = new Array[Long](numHash)
    java.util.Arrays.fill(minLow, -1L)  // unsigned max
    java.util.Arrays.fill(minHigh, -1L)
    val prefixes = hashPrefixCache.computeIfAbsent(numHash,
      (k: Integer) => Array.tabulate(k)(h => h.toString.getBytes("UTF-8")))
    var scratch = new Array[Byte](64)
    var contributed = 0
    var i = 0
    while (i < n) {
      // SQL-registered entry points accept array<string> with
      // containsNull=true: skip null elements (the md5 aggregate's
      // null-ignoring behavior) instead of NPE-ing
      if (!arr.isNullAt(i)) {
        contributed += 1
        val elemBytes =
          (if (isLong) java.lang.Long.toString(arr.getLong(i))
           else arr.getUTF8String(i).toString).getBytes("UTF-8")
        var h = 0
        while (h < numHash) {
          val p = prefixes(h)
          val total = p.length + elemBytes.length
          if (scratch.length < total) scratch = new Array[Byte](total * 2)
          System.arraycopy(p, 0, scratch, 0, p.length)
          System.arraycopy(elemBytes, 0, scratch, p.length, elemBytes.length)
          val (lo, hi) = xxh128(scratch, 0, total, 1L)
          val c = java.lang.Long.compareUnsigned(hi, minHigh(h))
          if (c < 0 || (c == 0 && java.lang.Long.compareUnsigned(lo, minLow(h)) < 0)) {
            minHigh(h) = hi; minLow(h) = lo
          }
          h += 1
        }
      }
      i += 1
    }
    if (contributed == 0) return null // all-null == empty: no elements hashed
    val out = new Array[AnyRef](numHash)
    var h = 0
    while (h < numHash) { out(h) = pyHex(minLow(h), minHigh(h)); h += 1 }
    new GenericArrayData(out)
  }

  private val hashPrefixCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Byte]]]()

  /** LSH band buckets, reference default mode: parse the Python-hex
    * signature slots back to unsigned 128-bit ints, band = numRows
    * consecutive slots, bucket = xxh32(bytes(repr(band_tuple)), seed=1) %
    * numBuckets (reference minhash_utils.py:101-113 + utils.py:44-47).
    * repr of a Python int tuple: "(a, b)" / single-element "(a,)", decimal.
    * Distinct, first-occurrence order (reference uses an unordered set; the
    * bucket SET is the contract). Null signature ⇒ null.
    */
  def bandBuckets(sig: ArrayData, numBands: Int, numRows: Int,
      numBuckets: Int): GenericArrayData = {
    val decimals = new Array[String](numBands * numRows)
    var i = 0
    while (i < decimals.length) {
      // a signature containing a null slot is malformed: propagate null
      // (standard SQL semantics) instead of NPE-ing on user-supplied arrays
      if (sig.isNullAt(i)) return null
      val s = sig.getUTF8String(i).toString
      // Python's int(s, 16) accepts both "0x..."-prefixed and bare hex —
      // tolerate both so md5-mode (bare 32-hex) signatures also bucketize
      val hex = if (s.startsWith("0x")) s.substring(2) else s
      decimals(i) = new java.math.BigInteger(hex, 16).toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Integer]()
    var b = 0
    while (b < numBands) {
      val sb = new java.lang.StringBuilder("(")
      var r = 0
      while (r < numRows) {
        if (r > 0) sb.append(", ")
        sb.append(decimals(b * numRows + r))
        r += 1
      }
      sb.append(if (numRows == 1) ",)" else ")")
      val bytes = sb.toString.getBytes("UTF-8")
      seen.add(Integer.valueOf(
        java.lang.Long.remainderUnsigned(xxh32(bytes, 0, bytes.length, 1), numBuckets).toInt))
      b += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** MinHash signature in the reference's DEFAULT (xxh128) hash family —
  * bit-parity mode. Input: array<long> vocab indices (reference pipeline
  * hashes vocab indices, minhash_utils.py:41-87) or array<string> shingles
  * (engine's direct mode, same family — parity not claimed, the reference
  * has no direct mode). Output: array<string> of Python-hex() signatures.
  */
case class MinHashXx128Signature(child: Expression, numHash: Int)
    extends UnaryExpression {

  require(numHash > 0, s"numHash must be > 0, got $numHash")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_xx128"

  private def isLong = child.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_xx128 requires array<string> or array<bigint>, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.XxHashKernel.minhashSig($a, $numHash, $isLong);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def nullSafeEval(input: Any): Any =
    XxHashKernel.minhashSig(input.asInstanceOf[ArrayData], numHash, isLong)

  override protected def withNewChildInternal(c: Expression): MinHashXx128Signature =
    copy(child = c)
}

/** LSH band buckets in the reference's default mode: xxh32(repr(band),
  * seed=1) % numBuckets over Python-hex signature slots.
  */
case class BandBucketsXx32(child: Expression, numBands: Int, numRows: Int, numBuckets: Int)
    extends UnaryExpression {

  require(numBands > 0 && numRows > 0 && numBuckets > 0,
    s"need positive bands/rows/buckets, got $numBands/$numRows/$numBuckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "band_buckets_xx32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_buckets_xx32 requires array<string>, got ${other.catalogString}")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.XxHashKernel.bandBuckets($a, $numBands, $numRows, $numBuckets);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def nullSafeEval(input: Any): Any =
    XxHashKernel.bandBuckets(input.asInstanceOf[ArrayData], numBands, numRows, numBuckets)

  override protected def withNewChildInternal(c: Expression): BandBucketsXx32 =
    copy(child = c)
}

object XxHashExpr {
  def minhashXx128(elems: Column, numHash: Int): Column =
    ColumnBridge.column(MinHashXx128Signature(ColumnBridge.expression(elems), numHash))
  def bandBucketsXx32(sig: Column, bands: Int, rows: Int, buckets: Int): Column =
    ColumnBridge.column(BandBucketsXx32(ColumnBridge.expression(sig), bands, rows, buckets))
}
