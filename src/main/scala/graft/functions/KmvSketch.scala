package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded k-minimum-values buffer: the k smallest DISTINCT longs seen.
  * Insert/merge are commutative and associative, so the aggregate is
  * deterministic under any partitioning or combine order. */
final class KMinSet(val k: Int) extends Serializable {
  private[functions] val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    if (set.size < k) set.add(h)
    else if (h < set.last) { if (set.add(h)) set.pollLast() }
  }
  def mergeIn(o: KMinSet): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
  }
  def toSortedArray: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** Shared wire format for KMinSet aggregation buffers — one codec for
  * both [[KmvSketchAgg]] and [[KmvMergeAgg]], so the partial-aggregate
  * exchange format can never diverge between the build and merge sides. */
private[functions] object KMinSetCodec {
  def serialize(buffer: KMinSet): Array[Byte] = {
    val arr = buffer.toSortedArray
    val bb = ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }
  def deserialize(bytes: Array[Byte], k: Int): KMinSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new KMinSet(k)
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }
}

/** One-pass per-group KMV sketch as a native `TypedImperativeAggregate`:
  * `kmv_kmins(hash, k)` yields the ascending array of the group's k
  * smallest distinct hash values.
  *
  * Why custom: the composable formulation (distinct on (group, hash) →
  * per-group rank → filter ≤ k) ships EVERY distinct hash of every group
  * through two exchanges before discarding all but k of them. This
  * aggregate's partial state is ≤ k longs per group per partition —
  * map-side combined like any sum, so a group with 10⁹ distinct values
  * still ships k longs per partition — and the merge (set union, keep k
  * smallest) is the KMV monoid, order-insensitive by construction.
  * NULL inputs contribute nothing (a NULL is no distinct value).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinSet] {

  require(k >= 1, "k must be at least 1")

  override def createAggregationBuffer(): KMinSet = new KMinSet(k)

  override def update(buffer: KMinSet, input: InternalRow): KMinSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KMinSet, other: KMinSet): KMinSet = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KMinSet): Any =
    new GenericArrayData(buffer.toSortedArray)

  override def serialize(buffer: KMinSet): Array[Byte] =
    KMinSetCodec.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): KMinSet =
    KMinSetCodec.deserialize(bytes, k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kmv_kmins"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

object KmvSketchAgg {
  /** Aggregate column: ascending array of the k smallest distinct values
    * of `hash` (a LONG column) in the group. */
  def kmvKMins(hash: Column, k: Int): Column =
    Bridge.column(
      KmvSketchAgg(Bridge.expression(hash), k).toAggregateExpression())
}
