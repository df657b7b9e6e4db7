package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-histogram moments of a string in ONE pass — custom codegen'd
  * Catalyst expression returning `[n, distinct, coll]` where `n` is the
  * code-point count, `distinct` the distinct-code-point count, and
  * `coll = Σ c·(c−1)` over per-code-point counts `c` (the unnormalized
  * collision count behind the Simpson diversity index
  * `coll / (n·(n−1))`).
  *
  * Why custom: the composable form is
  * `explode(split(text, '')) → groupBy(doc, char) → agg` — a corpus-wide
  * row explosion to one row PER CHARACTER through a shuffle, i.e. a
  * 100 TB text corpus becomes ~100 T shuffle rows for what is a per-row
  * streaming computation. This expression folds the histogram per
  * document inside the scan: zero extra rows, zero shuffle, exact
  * integers (no floating entropy — every downstream ratio stays
  * integer-pinnable in ppm).
  *
  * Counting is per Unicode code point (surrogate pairs count once),
  * matching character semantics engines agree on for the BMP+ range. An
  * `int[128]` array serves the ASCII fast path (normalized pipeline text
  * is `[a-z0-9 ]`); a HashMap catches the rest. NULL input → NULL output.
  */
@ExpressionDescription(
  usage = "char_hist_stats(text) - [n, distinct, collision] of the char histogram in one pass.")
case class CharHistStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "char_hist_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_hist_stats requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(CharHistStats.moments(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val gad = classOf[GenericArrayData].getName
      val helper = "graft.functions.CharHistStats$.MODULE$"
      s"${ev.value} = new $gad($helper.moments($a.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): CharHistStats =
    copy(child = newChild)
}

object CharHistStats {

  /** One pass over the string's code points: `[n, distinct, Σ c(c−1)]`.
    * `coll` accumulates incrementally — seeing a code point whose count
    * was already `c` adds `2c` to `Σ c(c−1)` — so no second histogram
    * pass. */
  def moments(s: String): Array[Long] = {
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var n = 0L
    var distinct = 0L
    var coll = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val prev =
        if (cp < 128) { val p = ascii(cp); ascii(cp) = p + 1; p }
        else {
          if (other == null) other = new java.util.HashMap[Integer, Integer]()
          val boxed = other.get(cp)
          val p = if (boxed == null) 0 else boxed.intValue()
          other.put(cp, p + 1)
          p
        }
      if (prev == 0) distinct += 1
      coll += 2L * prev
    }
    Array(n, distinct, coll)
  }

  def charHistStats(text: Column): Column =
    Bridge.column(CharHistStats(Bridge.expression(text)))
}
