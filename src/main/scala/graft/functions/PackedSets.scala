package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact long packing of short-string sets + the long-merge Jaccard — the
  * r18 verification fast path.
  *
  * The LSH/winnow candidate verification ran [[SortedJaccard]] over SORTED
  * STRING shingle arrays: each merge step calls `ArrayData.getUTF8String`
  * (an object allocation per element per pair) and a byte-loop compare.
  * With ~1M candidate pairs × ~10³-element sets at sf0.1, that merge WAS
  * the dedup family's dominant cost (r18 profile: ~27 of each query's
  * ~31 cumulative task-seconds).
  *
  * Char shingles are substrings of [[graft.llm.TextStats.normalizeText]]
  * output — k ≤ 8 single-byte chars from `[a-z0-9 ]`, never NUL — so each
  * shingle packs EXACTLY into one long (big-endian, left-justified,
  * zero-padded): the packing is injective (no trailing-NUL ambiguity
  * because inputs are NUL-free) and order-preserving (unsigned long order
  * = unsigned byte order = `UTF8String` order for equal-or-prefix-padded
  * bytes). Therefore |A∩B| and |A∪B| — and the IEEE division — are
  * bit-identical to the string-side computation; the packed merge just
  * compares primitive longs. Inputs that violate the contract (> 8 bytes,
  * or a 0x00 byte) fail LOUDLY at pack time — never a silent wrong pack.
  */
@ExpressionDescription(
  usage = "pack_shingle_set(a) - pack an array of <=8-byte NUL-free strings into big-endian longs.")
case class PackShingleSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pack_shingle_set requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(i) = PackShingleSet.packOne(arr.getUTF8String(i))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  // interpreted-only: the expression runs once per DOCUMENT (the merge
  // runs per PAIR); a codegen split would buy nothing measurable. The
  // surrounding operators stay whole-stage-codegen'd via this fallback.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val cls = classOf[PackShingleSet].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $out[$i] = $cls.packOne($a.getUTF8String($i));
         |  }
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackShingleSet =
    copy(child = newChild)
}

object PackShingleSet {
  /** Big-endian left-justified zero-padded pack of ≤ 8 NUL-free bytes.
    * Public + static-reachable so generated code can call it. */
  def packOne(s: UTF8String): Long = {
    val nb = s.numBytes()
    if (nb > 8)
      throw new IllegalArgumentException(
        s"pack_shingle_set: element longer than 8 bytes ($nb): " +
          s"'${s.toString.take(16)}' — packed verification requires shingleSize <= 8")
    val bytes = s.getBytes
    var v = 0L
    var i = 0
    while (i < nb) {
      val b = bytes(i)
      if (b == 0)
        throw new IllegalArgumentException(
          "pack_shingle_set: element contains a NUL byte — packing would be ambiguous")
      v = (v << 8) | (b & 0xFFL)
      i += 1
    }
    // left-justify: shift the remaining (8 - nb) bytes of zero padding in
    v << (8 * (8 - nb))
  }
}

/** Jaccard of two SORTED, DISTINCT packed-long arrays — the long twin of
  * [[SortedJaccard]] (same merge, same null-element rule, same IEEE
  * division), comparing with `Long.compareUnsigned` to match the unsigned
  * byte order the packing preserves. */
@ExpressionDescription(
  usage = "sorted_jaccard_long(a, b) - Jaccard similarity of two sorted distinct long arrays.")
case class SortedJaccardLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard_long requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val xn = a.isNullAt(i)
      val yn = b.isNullAt(j)
      val c = if (xn || yn) { if (xn && yn) 0 else if (xn) -1 else 1 }
        else java.lang.Long.compareUnsigned(a.getLong(i), b.getLong(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xn = ctx.freshName("xn")
      val yn = ctx.freshName("yn")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |if ($na == 0 && $nb == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  int $i = 0; int $j = 0; int $inter = 0;
         |  while ($i < $na && $j < $nb) {
         |    boolean $xn = $a.isNullAt($i);
         |    boolean $yn = $b.isNullAt($j);
         |    int $c;
         |    if ($xn || $yn) {
         |      $c = ($xn && $yn) ? 0 : ($xn ? -1 : 1);
         |    } else {
         |      $c = java.lang.Long.compareUnsigned($a.getLong($i), $b.getLong($j));
         |    }
         |    if ($c == 0) { $inter++; $i++; $j++; }
         |    else if ($c < 0) { $i++; }
         |    else { $j++; }
         |  }
         |  ${ev.value} = ((double) $inter) / ($na + $nb - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccardLong =
    copy(left = newLeft, right = newRight)
}

object PackedSets {
  /** Column API: pack a sorted ≤8-byte-string set into a sorted long set. */
  def packShingleSet(a: Column): Column =
    Bridge.column(PackShingleSet(Bridge.expression(a)))

  /** Column API: Jaccard of two sorted distinct packed-long sets. */
  def sortedJaccardLong(a: Column, b: Column): Column =
    Bridge.column(SortedJaccardLong(Bridge.expression(a), Bridge.expression(b)))
}
