package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct character k-shingles of a string in ONE pass — custom
  * codegen'd Catalyst expression.
  *
  * Why custom: the composable form
  * `array_sort(array_distinct(transform(sequence(1, L−k+1), i => substr)))`
  * is an interpreted higher-order-function pass (per-position lambda
  * dispatch + boxing) followed by two more array passes; it runs once per
  * document per LSH pipeline leg, right next to [[MinHashSig]] in the
  * profile. This expression extracts each shingle once into a binary-
  * ordered TreeSet — distinct and sorted fall out of the insertion.
  *
  * Bit-identical to the HOF form: `substringSQL` is the same
  * character-based (code-point) truncating substring `Column.substr`
  * lowers to; position range is `1..max(L−k+1, 1)` (so a document shorter
  * than k yields its whole text as one shingle, and an empty document one
  * empty shingle — exactly `sequence(1, greatest(L−(k−1), 1))`); and
  * `UTF8String.compareTo` is the binary ordering `array_sort` uses for
  * strings. NULL input → NULL output, like `transform`.
  */
@ExpressionDescription(
  usage = "char_shingle_set(text, k) - sorted distinct character k-shingles in one pass.")
case class CharShingleSet(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "shingle size must be at least 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_shingle_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingle_set requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = math.max(s.numChars() - (k - 1), 1)
    val set = new java.util.TreeSet[UTF8String]()
    var i = 1
    while (i <= n) { set.add(s.substringSQL(i, k)); i += 1 }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val set = ctx.freshName("set")
      s"""
         |int $n = java.lang.Math.max($a.numChars() - ${k - 1}, 1);
         |java.util.TreeSet<$utf8> $set = new java.util.TreeSet<$utf8>();
         |for (int $i = 1; $i <= $n; $i++) {
         |  $set.add($a.substringSQL($i, $k));
         |}
         |${ev.value} = new $gad($set.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharShingleSet =
    copy(child = newChild)
}

object CharShingleSet {
  def charShingleSet(text: Column, k: Int): Column =
    Bridge.column(CharShingleSet(Bridge.expression(text), k))
}
