package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash as a true distributed AGGREGATE: `minhash_md5_agg(shingle)` over
  * one-shingle-per-row relations (`explode(shingles) → groupBy(doc)`), the
  * relational twin of the per-row array kernel [[MinHashMd5Signature]].
  *
  * Why it exists: when the corpus is already stored exploded — an inverted
  * shingle index, a streaming shingle feed, a shuffle-partitioned
  * (doc, shingle) relation — re-collecting `collect_list(shingle)` per doc
  * just to call the array kernel materializes the whole document as one
  * aggregation cell. This aggregate folds each shingle into 16-byte running
  * minima as rows stream through the hash aggregate, with partial
  * aggregation (map-side combine) and spill-safe serialization for free.
  * Buffer size is numHash × 17 bytes regardless of document size.
  *
  * Hash semantics are bit-identical to [[MinHashMd5Signature]] (md5 of
  * `h.toString ++ shingle`, unsigned byte-wise min == lexicographic min on
  * the hex encoding); KernelSpec asserts aggregate ≡ per-row kernel ≡ the
  * DuckDB oracle. Groups with no non-null input evaluate to null (the
  * per-row kernel's empty-array contract).
  */
case class MinHashMd5Agg(
    child: Expression,
    numHash: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] with UnaryLike[Expression] {

  require(numHash > 0, s"numHash must be > 0, got $numHash")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_md5_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5_agg requires a string column, got ${other.catalogString}")
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

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](numHash)

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v == null) return buf
    val sBytes = v.asInstanceOf[UTF8String].getBytes
    val md = digestLocal.get()
    val scratch = new Array[Byte](16)
    var h = 0
    while (h < numHash) {
      md.reset()
      md.update(hashPrefixes(h))
      md.update(sBytes)
      md.digest(scratch, 0, 16)
      if (buf(h) == null) buf(h) = java.util.Arrays.copyOf(scratch, 16)
      else if (lessThan(scratch, buf(h))) System.arraycopy(scratch, 0, buf(h), 0, 16)
      h += 1
    }
    buf
  }

  override def merge(buf: Array[Array[Byte]], other: Array[Array[Byte]]): Array[Array[Byte]] = {
    var h = 0
    while (h < numHash) {
      if (buf(h) == null) buf(h) = other(h)
      else if (other(h) != null && lessThan(other(h), buf(h))) buf(h) = other(h)
      h += 1
    }
    buf
  }

  override def eval(buf: Array[Array[Byte]]): Any = {
    if (buf(0) == null) return null // all slots fill together; 0 stands for all
    val out = new Array[AnyRef](numHash)
    var h = 0
    while (h < numHash) {
      out(h) = toHex(buf(h))
      h += 1
    }
    new GenericArrayData(out)
  }

  /** numHash × (present flag + 16 bytes); fixed-size, spill/exchange safe. */
  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](numHash * 17)
    var h = 0
    while (h < numHash) {
      if (buf(h) != null) {
        out(h * 17) = 1
        System.arraycopy(buf(h), 0, out, h * 17 + 1, 16)
      }
      h += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](numHash)
    var h = 0
    while (h < numHash) {
      if (bytes(h * 17) == 1)
        buf(h) = java.util.Arrays.copyOfRange(bytes, h * 17 + 1, h * 17 + 17)
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashMd5Agg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashMd5Agg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MinHashMd5Agg =
    copy(child = c)
}

object MinHashAgg {
  /** DataFrame surface: `df.groupBy(id).agg(minhashMd5Agg(col("shingle"), 16))`. */
  def minhashMd5Agg(shingle: Column, numHash: Int): Column =
    ColumnBridge.column(
      MinHashMd5Agg(ColumnBridge.expression(shingle), numHash).toAggregateExpression())
}
