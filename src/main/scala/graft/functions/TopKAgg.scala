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

/** Grouped top-k as a bounded-heap AGGREGATE — the scale-correct form of
  * "top n per key".
  *
  * The usual encoding, `row_number() over (partition by key order by score
  * desc) <= k`, shuffles and SORTS every candidate row of every key. This
  * aggregate keeps a k-bounded binary heap per group instead: partial
  * aggregation reduces each map partition to at most k rows per key before
  * the exchange, the shuffle carries heaps (k × 16 bytes), and nothing is
  * ever globally sorted. At 100 TB the window form moves the whole candidate
  * set through the wire; this moves k rows per key per partition.
  *
  * Input: `struct(score: double, id: long)` per row. Output: the top-k
  * entries as `array<struct<score, id>>`, sorted best-first with the
  * deterministic order (score DESC, id ASC) — ties pinned by ascending id,
  * matching the engine's ANN tie rule. Null inputs and null scores are
  * ignored; an all-null group yields an empty array.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with UnaryLike[Expression] {

  require(k > 0, s"k must be > 0, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_agg requires struct<double, long>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(heap: TopKHeap, input: InternalRow): TopKHeap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) heap.offer(row.getDouble(0), row.getLong(1))
    }
    heap
  }

  override def merge(heap: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      heap.offer(other.scores(i), other.ids(i))
      i += 1
    }
    heap
  }

  override def eval(heap: TopKHeap): Any = {
    val (scores, ids) = heap.sortedBestFirst
    val out = new Array[AnyRef](scores.length)
    var i = 0
    while (i < scores.length) {
      out(i) = InternalRow(scores(i), ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k, size, then (score, id) pairs — fixed bound, spill/exchange safe. */
  override def serialize(heap: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + heap.size * 16)
    bb.putInt(heap.k).putInt(heap.size)
    var i = 0
    while (i < heap.size) {
      bb.putDouble(heap.scores(i)).putLong(heap.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      heap.offer(bb.getDouble, bb.getLong)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKAgg =
    copy(child = c)
}

/** k-bounded binary min-heap on (score ASC, id DESC): the root is the WORST
  * kept entry, so a better candidate replaces it in O(log k). "Better" =
  * higher score, then smaller id (the engine's deterministic ANN tie rule).
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true if (s1, i1) is WORSE than (s2, i2) — lower score, or same score
    * and larger id. The heap keeps the worst at the root.
    */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def offer(score: Double, id: Long): Unit = {
    // NaN policy: skipped, same as null scores at the aggregate layer. NaN
    // breaks the strict-weak-order contract of both `worse` and the
    // sortedBestFirst comparator (every comparison involving NaN is false,
    // so a NaN could lodge at the root and block all future admissions).
    // Engine scorers never produce NaN (cosine() yields null for zero
    // vectors), but graft_topk is public SQL surface.
    if (score.isNaN) return
    if (size < k) {
      var i = size
      scores(i) = score; ids(i) = id
      size += 1
      // sift up: parent must be worse than child
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2)
        i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      // sift down: move the new entry below any worse child
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var worst = i
        if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == i) done = true
        else { swap(i, worst); i = worst }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val t = ids(a); ids(a) = ids(b); ids(b) = t
  }

  /** Entries best-first: score DESC, id ASC. */
  def sortedBestFirst: (Array[Double], Array[Long]) = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
    (idx.map(scores), idx.map(ids))
  }
}

object TopKAgg {
  /** DataFrame surface: `df.groupBy(key).agg(topK(col("score"), col("id"), 10))`
    * → `array<struct<score, id>>` best-first.
    */
  def topK(score: Column, id: Column, k: Int): Column = {
    val child = org.apache.spark.sql.functions.struct(
      score.cast("double").as("score"), id.cast("long").as("id"))
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(child), k).toAggregateExpression())
  }
}
