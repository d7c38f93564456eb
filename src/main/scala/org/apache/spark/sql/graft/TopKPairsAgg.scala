package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded max-heap buffer: keeps the k smallest (dist, id) pairs,
  * deterministic tiebreak on id. */
final class TopKHeap(val k: Int) {
  // max-heap on (dist, id) so the worst survivor is at the root
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    math.max(k, 1),
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def add(dist: Double, id: Long): Unit = {
    if (heap.size < k) heap.add((dist, id))
    else {
      val worst = heap.peek()
      if (dist < worst._1 || (dist == worst._1 && id < worst._2)) {
        heap.poll(); heap.add((dist, id))
      }
    }
  }

  def mergeFrom(other: TopKHeap): Unit =
    other.heap.forEach(p => add(p._1, p._2))

  /** Ascending (dist, id). */
  def sorted: Array[(Double, Long)] = {
    val arr = heap.toArray(new Array[(Double, Long)](heap.size))
    scala.util.Sorting.stableSort(arr,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    arr
  }

  def serialize(): Array[Byte] = {
    val arr = sorted
    val buf = ByteBuffer.allocate(8 + arr.length * 16)
    buf.putInt(k).putInt(arr.length)
    arr.foreach { case (d, i) => buf.putDouble(d).putLong(i) }
    buf.array()
  }
}

object TopKHeap {
  def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(buf.getInt)
    val n = buf.getInt
    (0 until n).foreach(_ => h.add(buf.getDouble, buf.getLong))
    h
  }
}

/** Per-group exact top-k as a single-pass aggregate: O(k) state per
  * group instead of the window form's full per-partition sort —
  * the SURVEY §4.3 "bounded heap if window shuffle too slow" option.
  * Map-side partial heaps combine in merge(), so only k rows per
  * group per partition ever cross the shuffle. Output:
  * `ARRAY<STRUCT<dist DOUBLE, id BIGINT>>` ascending by (dist, id) —
  * identical content to `row_number().over(orderBy(dist, id)) <= k`
  * (asserted in TopKAggSpec). NULL dist inputs are skipped (the
  * zero-norm-vector exclusion, quirk Q4). */
case class TopKPairs(
    dist: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(dist, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dist", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null)
      buffer.add(d.asInstanceOf[Double], i.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sorted.map { case (d, i) =>
      new GenericInternalRow(Array[Any](d, i))
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(dist = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Aggregate Column: exact top-k (dist asc, id tiebreak) per group. */
  def topkPairs(dist: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairs(ExpressionUtils.expression(dist), ExpressionUtils.expression(id), k)
        .toAggregateExpression())
}
