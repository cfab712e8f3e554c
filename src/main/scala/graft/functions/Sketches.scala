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

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a true distributed
  * AGGREGATE: `count_min_agg(token, depth, width)` folds a token stream
  * into a depth×width counter matrix with partial aggregation (map-side
  * combine) and spill-safe serialization for free.
  *
  * Why it exists at 100 TB: exact token/n-gram frequency needs a
  * corpus-wide (token, count) shuffle whose width is the vocabulary —
  * billions of keys for n-grams. The sketch's state is depth×width longs
  * (32 KB at 4×1024) PER PARTITION regardless of corpus size; partials
  * merge by elementwise addition, so the exchange carries one fixed-size
  * buffer per map task and point-query estimates obey
  * `true ≤ est ≤ true + εN` with ε = e/width at δ = e^-depth.
  *
  * Hash semantics are the repo's oracle idiom: row r of the matrix
  * indexes `uint32(first 8 hex chars of md5("r:" ++ token)) mod width` —
  * replayed in DuckDB as `CAST('0x' || substr(md5(r || ':' || token), 1,
  * 8) AS UBIGINT) % width`. Evaluates to the flattened row-major counter
  * matrix (never null: an empty group is the zero matrix).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
  require(width >= 2 && width <= (1 << 20), s"width in [2,2^20], got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_agg requires a string column, got ${other.catalogString}")
  }

  @transient private lazy val rowPrefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(r => s"$r:".getBytes("UTF-8"))

  @transient private lazy val digestLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val sBytes = v.asInstanceOf[UTF8String].getBytes
    val md = digestLocal.get()
    val scratch = new Array[Byte](16)
    var r = 0
    while (r < depth) {
      md.reset()
      md.update(rowPrefixes(r))
      md.update(sBytes)
      md.digest(scratch, 0, 16)
      // first 4 digest bytes == first 8 hex chars, as unsigned 32-bit
      val h = ((scratch(0) & 0xFFL) << 24) | ((scratch(1) & 0xFFL) << 16) |
        ((scratch(2) & 0xFFL) << 8) | (scratch(3) & 0xFFL)
      buf(r * width + (h % width).toInt) += 1L
      r += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  /** Fixed 8·depth·width bytes; spill/exchange safe. */
  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](depth * width)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
}

object Sketches {
  /** DataFrame surface: `df.agg(countMinAgg(col("token"), 4, 1024))`. */
  def countMinAgg(token: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(token), depth, width)
        .toAggregateExpression())
}
