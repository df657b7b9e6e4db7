package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded "k smallest values" buffer over an arbitrary orderable Catalyst
  * type: a max-heap of the current k smallest, so insert is O(log k) and a
  * group with 10⁹ rows still holds k values. Duplicates are KEPT (this is
  * a top-k of rows, not a distinct set — multiplicity matters). Insert and
  * merge are commutative/associative given a TOTAL input order, so the
  * aggregate is deterministic under any partitioning or combine order. */
final class BoundedTopK(val k: Int, val dt: DataType, val reverse: Boolean = false) {
  private val base = TypeUtils.getInterpretedOrdering(dt)
  private val ord: Ordering[Any] = if (reverse) base.reverse else base
  // java PriorityQueue with REVERSED ordering: peek() = largest of the
  // current k smallest — the eviction candidate
  private val heap = new java.util.PriorityQueue[Any](
    math.max(k, 1),
    new java.util.Comparator[Any] {
      override def compare(a: Any, b: Any): Int = ord.compare(b, a)
    })
  def add(v: Any): Unit = {
    if (heap.size < k) heap.offer(v)
    else if (ord.lt(v, heap.peek)) { heap.poll(); heap.offer(v) }
  }
  def mergeIn(o: BoundedTopK): Unit = {
    val it = o.heap.iterator()
    while (it.hasNext) add(it.next())
  }
  /** Ascending (rank order). */
  def toSortedArray: Array[Any] = {
    val out = heap.toArray
    java.util.Arrays.sort(out, new java.util.Comparator[AnyRef] {
      override def compare(a: AnyRef, b: AnyRef): Int = ord.compare(a, b)
    })
    out.asInstanceOf[Array[Any]]
  }
}

/** Per-group top-k as a native `TypedImperativeAggregate`:
  * `top_k(struct(order..., payload...), k)` yields the group's k SMALLEST
  * struct values in ascending order; with `reverse = true`, the k LARGEST
  * in descending order (rank 1 = largest) — the native form of an order
  * no caller-side negation can encode (strings, mixed-direction keys).
  *
  * Why custom — the 100-TB answer to the hot-group window sort: the
  * conventional `row_number().over(partitionBy(group).orderBy(...)) ≤ k`
  * ships EVERY row of every group through the exchange and sorts each
  * group in ONE task — with a single hot group (one user, one event type)
  * that is a straggler task sorting billions of rows to keep three of
  * them. This aggregate's partial state is ≤ k values per (group,
  * partition), map-side combined like a sum: the exchange carries at most
  * k·P rows per group no matter how hot the group, and no task ever sorts
  * more than k·P values. The merge (insert each, keep k smallest) is the
  * bounded-top-k monoid, order-insensitive given a total input order —
  * make the struct prefix a total order (include a tiebreak id) and the
  * result is exactly the window formulation's, deterministically.
  *
  * NULL inputs contribute nothing; struct ordering is Spark's standard
  * lexicographic field order (same rule `array_max`/`sort_array` use).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK] {

  require(k >= 1, "k must be at least 1")

  override def createAggregationBuffer(): BoundedTopK =
    new BoundedTopK(k, child.dataType, reverse)

  override def update(buffer: BoundedTopK, input: InternalRow): BoundedTopK = {
    val v = child.eval(input)
    // copyValue: eval of struct children returns a reused row buffer
    if (v != null) buffer.add(InternalRow.copyValue(v))
    buffer
  }

  override def merge(buffer: BoundedTopK, other: BoundedTopK): BoundedTopK = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: BoundedTopK): Any =
    new GenericArrayData(buffer.toSortedArray)

  // shuffle format: [count:int] then per element [len:int][UnsafeRow bytes]
  @transient private lazy val ser = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val row1 = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buffer: BoundedTopK): Array[Byte] = {
    val vals = buffer.toSortedArray
    val frames = vals.map { v =>
      row1.update(0, v)
      ser(row1).getBytes.clone()
    }
    val bb = ByteBuffer.allocate(4 + frames.map(4 + _.length).sum)
    bb.putInt(frames.length)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new BoundedTopK(k, child.dataType, reverse)
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val frame = new Array[Byte](len)
      bb.get(frame)
      row.pointTo(frame, len)
      // the extracted value references `frame`, which is fresh per element
      // — safe to hold without another copy
      out.add(row.get(0, child.dataType))
      i += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
}

object TopKAgg {
  /** Aggregate column: ascending array of the group's k smallest values of
    * `v` (typically `struct(orderKeys..., payload)`); with
    * `reverse = true`, descending array of the k largest. */
  def topK(v: Column, k: Int, reverse: Boolean = false): Column =
    Bridge.column(TopKAgg(Bridge.expression(v), k, reverse).toAggregateExpression())
}
