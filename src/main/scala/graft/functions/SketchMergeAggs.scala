package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Merge aggregates for PERSISTED sketch tables (r16, VERDICT task 6).
  *
  * The sketch-TABLE pattern — persist per-(source, day) sketches once,
  * answer every coarser query from the sketch table, never rescan the
  * corpus — was Scala-only on the merge side: `kmv_kmins` builds a sketch
  * from raw values, but rolling existing sketch ARRAYS up needed
  * [[graft.sketch.KmvOps.kmvMergeDistinct]]'s explode, and merging
  * persisted CMS BINARIES had no SQL form at all (Spark ships
  * `count_min_sketch` the builder, no merge aggregate). These two close
  * that: a pure-SQL user can now write
  *
  * {{{
  *   SELECT source, kmv_merge(kmv_sketch, 16)      FROM kmv_daily GROUP BY source
  *   SELECT source, cms_merge(cms)                 FROM cms_daily GROUP BY source
  * }}}
  *
  * Both are the sketches' own monoids (k-min of union; cellwise sum), so
  * the merged sketch is IDENTICAL to sketching the raw union — the
  * property the SketchSqlSpec rollup specs pin against the direct path.
  *
  * SAME-PARAMETER CONTRACT — MACHINE-CHECKED (r17). `cms_merge` enforces
  * shape compatibility for free (the blobs carry depth/width/seed;
  * mergeInPlace throws on a mismatch). `kmv_merge`'s compatibility is NOT
  * verifiable from the arrays alone: merging sketches built with a
  * SMALLER k than the merge k yields a well-shaped but WRONG sketch
  * (positions beyond the input k are not the true k-mins of the union —
  * an input array shorter than k is indistinguishable from a
  * legitimately small group). The check therefore rides the DATA:
  * [[graft.sketch.KmvOps.kmvSketch]] persists the build k beside every
  * sketch as `kmv_k`, and the CHECKED merge forms validate it per-row
  * with a loud build-k-mismatch error —
  *
  * {{{
  *   SELECT source, kmv_merge(kmv_sketch, kmv_k, 16)   -- 3-arg checked
  *   FROM kmv_daily GROUP BY source
  * }}}
  *
  * (the Scala face `KmvOps.kmvMergeDistinct` auto-validates whenever the
  * input carries `kmv_k`). The 2-arg form stays for tables that predate
  * the convention — unchecked, the documented caller contract.
  * (HLL needs no new function: this library's HLL form is the row-grain
  * `(bucket, reg)` register table, whose merge is plain
  * `max(reg) GROUP BY bucket` SQL; corr moment tables re-aggregate with
  * plain SUMs. SketchSqlSpec pins those two patterns too.)
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    buildK: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinSet] {

  require(k >= 1, "k must be at least 1")

  override def createAggregationBuffer(): KMinSet = new KMinSet(k)

  override def update(buffer: KMinSet, input: InternalRow): KMinSet = {
    buildK.foreach { bk =>
      val b = bk.eval(input)
      require(b != null && b.asInstanceOf[Number].longValue() >= k,
        s"kmv_merge build-k mismatch: merge k=$k exceeds build k=" +
          s"${if (b == null) "NULL" else b} — positions beyond the build k" +
          " are not the true k-mins of the union; merge at k <= build k")
    }
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { buffer.add(arr.getLong(i)); i += 1 }
    }
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
  override def children: Seq[Expression] = Seq(child) ++ buildK
  override def prettyName: String = "kmv_merge"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head,
      buildK = if (newChildren.length > 1) Some(newChildren(1)) else None)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
}

object KmvMergeAgg {
  /** Aggregate column: merge of the group's `array<long>` KMV sketches
    * (each built with the same k) — the k smallest distinct values across
    * all of them, ascending. */
  def kmvMerge(sketch: Column, k: Int): Column =
    Bridge.column(
      KmvMergeAgg(Bridge.expression(sketch), k).toAggregateExpression())

  /** The CHECKED form: `buildK` is the persisted build-k column riding
    * beside the sketch ([[graft.sketch.KmvOps.kmvSketch]]'s `kmv_k`);
    * every row must satisfy build k ≥ merge k or the merge fails loudly. */
  def kmvMergeChecked(sketch: Column, buildK: Column, k: Int): Column =
    Bridge.column(
      KmvMergeAgg(Bridge.expression(sketch), k,
        Some(Bridge.expression(buildK))).toAggregateExpression())
}

/** Mutable CMS merge buffer: empty until the first sketch arrives (the
  * sketch's depth/width/seed come from the DATA — declaring them as
  * function parameters would just duplicate what every blob carries).
  * Incompatible sketches (different eps/delta/seed) fail loudly via
  * CountMinSketch.mergeInPlace's IncompatibleMergeException. */
final class CmsMergeBuffer extends Serializable {
  var cms: CountMinSketch = _
  def addBlob(bytes: Array[Byte]): Unit = {
    val in = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    if (cms == null) cms = in else cms.mergeInPlace(in)
  }
  def mergeIn(o: CmsMergeBuffer): Unit =
    if (o.cms != null) {
      if (cms == null) cms = o.cms else cms.mergeInPlace(o.cms)
    }
  def toBytes: Array[Byte] =
    if (cms == null) Array.emptyByteArray
    else {
      val out = new ByteArrayOutputStream()
      cms.writeTo(out)
      out.toByteArray
    }
}

case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsMergeBuffer] {

  override def createAggregationBuffer(): CmsMergeBuffer = new CmsMergeBuffer

  override def update(buffer: CmsMergeBuffer, input: InternalRow): CmsMergeBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.addBlob(v.asInstanceOf[Array[Byte]])
    buffer
  }

  override def merge(buffer: CmsMergeBuffer, other: CmsMergeBuffer): CmsMergeBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  /** NULL for an all-NULL/empty group — there is no "empty CMS" without
    * inventing shape parameters the group never provided. */
  override def eval(buffer: CmsMergeBuffer): Any =
    if (buffer.cms == null) null else buffer.toBytes

  override def serialize(buffer: CmsMergeBuffer): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): CmsMergeBuffer = {
    val out = new CmsMergeBuffer
    if (bytes.nonEmpty) out.addBlob(bytes)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "cms_merge"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
}

object CmsMergeAgg {
  /** Aggregate column: cellwise-sum merge of the group's serialized CMS
    * blobs (all built with the same eps/delta/seed — enforced by the
    * sketch library). NULL for an all-NULL group. */
  def cmsMerge(cms: Column): Column =
    Bridge.column(
      CmsMergeAgg(Bridge.expression(cms)).toAggregateExpression())
}
