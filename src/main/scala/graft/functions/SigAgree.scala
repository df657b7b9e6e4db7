package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Position-agreement count of two long arrays — the MinHash
  * signature-agreement prefilter as ONE codegen'd tight loop.
  *
  * Why custom (guide §1.2 step 2 / §4.1 "prefer built-ins with codegen"):
  * the composable form
  * `size(filter(zip_with(a, b, (x, y) => x === y), p => p))` allocates two
  * intermediate arrays and dispatches two boxed lambdas per element PER
  * CANDIDATE PAIR — and the LSH band join emits ~1.2M candidate pairs at
  * sf0.1 (candidates ∝ duplication density at any scale), which made this
  * single expression the dominant cost of every minHashDedupPairs consumer
  * (r18 profile: the verify stage was 4.4–4.6 s of each ~10 s query). The
  * loop below compares primitive longs with zero allocation.
  *
  * Semantics pinned to the HOF form by SigAgreeSpec: positions beyond the
  * shorter array never match (zip_with pads with null; null === x is null;
  * `filter` drops non-true), and a null ELEMENT on either side at a
  * position does not match. MinHash signatures are fixed-length non-null,
  * but the expression must be a drop-in equivalent, not a special case.
  */
@ExpressionDescription(
  usage = "sig_agree(a, b) - count of positions where two long arrays hold equal non-null values.")
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sig_agree requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var agree = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) {
         |    $agree++;
         |  }
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

object SigAgree {
  /** Column API: agreement count of two long-array signatures. */
  def sigAgree(a: Column, b: Column): Column =
    Bridge.column(SigAgree(Bridge.expression(a), Bridge.expression(b)))
}
