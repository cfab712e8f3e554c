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

/** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; Beyer et al.
  * 2007 for the multi-set operations): keep the k smallest DISTINCT
  * 64-bit hash values of a stream. `kth smallest / 2⁶⁴` estimates the
  * fraction of hash space covered by k distinct elements, so
  * `D̂ = (k−1)/θ`; two sketches combine by set ops on their value sets,
  * which is what HLL cannot do — INTERSECTION and Jaccard estimates come
  * from the same 2 KB of state.
  *
  * Why it exists at 100 TB: exact distinct-intersection of two key sets
  * is a full co-shuffle of both; the sketch reduces each side to k longs
  * (partial-aggregated — map tasks emit one bounded buffer), and the
  * combine is driver-trivial array math. Below k distinct values the
  * sketch IS the value set and every estimate is exact — the small-side
  * regime degrades to truth, not noise.
  *
  * Values are stored SIGN-FLIPPED (`h ^ Long.MinValue`) so ascending
  * signed order is ascending unsigned order of the raw hash; the
  * estimation helpers undo the flip. Input must be a LONG hash column
  * (`xxhash64(key)` — 64-bit, engine-reproducible).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 16, s"k must be >= 16, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_agg needs a LONG hash input (xxhash64), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[Long] ^ Long.MinValue
      if (buf.size < k) buf.add(u)
      else if (u < buf.last) { if (buf.add(u)) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val u = it.next()
      if (buf.size < k) buf.add(u)
      else if (u < buf.last) { if (buf.add(u)) buf.pollLast() }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvAgg =
    copy(child = c)
}

object Sketches {
  /** DataFrame surface: `df.agg(countMinAgg(col("token"), 4, 1024))`. */
  def countMinAgg(token: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(token), depth, width)
        .toAggregateExpression())

  /** `df.agg(kmvAgg(xxhash64(col("key")), 256))` → sorted flipped-hash
    * array (≤ k longs).
    */
  def kmvAgg(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(hash), k).toAggregateExpression())

  private val Two63 = 9.223372036854775808e18
  private val Two64 = 1.8446744073709551616e19

  /** Distinct-count estimate from a KMV sketch: exact below k (the sketch
    * holds every distinct hash), `(k−1)/θ` at capacity with θ the kth
    * smallest hash as a fraction of the 64-bit space.
    */
  def kmvDistinct(sketch: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(sketch, k).cast("double") + Two63) / Two64))
  }

  /** Intersection-size estimate of two KMV sketches (Beyer et al. 2007):
    * the k smallest of the union form a uniform sample of A∪B; the
    * fraction of that sample present in BOTH sketches estimates Jaccard,
    * and `Ĵ · D̂(A∪B)` the intersection size. Exact when both sides are
    * below capacity.
    */
  def kmvIntersect(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val union = slice(array_sort(array_union(a, b)), 1, k)
    val theta = element_at(union, size(union)) // largest retained union hash
    val common = size(filter(array_intersect(a, b), x => x <= theta))
    val jacc = common.cast("double") / size(union)
    when(size(union) === 0, lit(0.0)).otherwise(jacc * kmvDistinct(union, k))
  }
}
