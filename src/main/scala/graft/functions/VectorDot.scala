package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays as one tight loop — custom Catalyst
  * expression.
  *
  * Why custom: the composable form
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,x) => acc+x)` allocates
  * a zipped array and evaluates two lambda closures per element per row; in
  * brute-force similarity scans the dot product runs once per *pair*, which
  * made it the profile leader. Semantics match the HOF form bit-for-bit:
  * elements are widened to double first, accumulation is sequential
  * left-to-right (also matching DuckDB's `list_cosine_similarity` on
  * `DOUBLE[]`, which the oracle uses).
  *
  * Arrays of different lengths multiply up to the shorter length (same as
  * `zip_with` would with nulls dropped — inputs here are fixed-dim
  * embeddings, so lengths agree in practice).
  */
@ExpressionDescription(
  usage = "vector_dot(a, b) - dot product of two numeric arrays in double precision.")
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case ArrayType(t: DecimalType, _) => Some(t) // SQL numeric literals
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires numeric array inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  @transient private lazy val leftElem = elemType(left).get
  @transient private lazy val rightElem = elemType(right).get

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other       => throw new IllegalStateException(s"unexpected $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      // skip null slots like zip_with's null-propagating multiply would
      // yield null products; embeddings don't contain nulls in practice
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += get(a, i, leftElem) * get(b, i, rightElem)
      }
      i += 1
    }
    acc
  }

  /** Per-element Java accessor returning a double, for codegen. */
  private def getJava(arr: String, i: String, t: DataType): String = t match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case d: DecimalType =>
      s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${getJava(a, i, leftElem)} * ${getJava(b, i, rightElem)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def dot(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))
}
