package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** All `numHashes` MinHash minima of a string set in ONE array traversal —
  * custom codegen'd Catalyst expression.
  *
  * Why custom: the composable form (`transform(set, s => xxhash64(s))`
  * then, per seed h, `array_min(transform(hashes, x => xxhash64(x, h)))`)
  * is `numHashes + 1` higher-order-function passes per document — each a
  * CodegenFallback with per-element lambda dispatch and boxing, which made
  * the signature stage the constant tax on every LSH dedup query. This
  * expression walks the set once: per element it computes the base hash
  * and the per-seed derivations in a tight generated loop over primitive
  * longs.
  *
  * Bit-identical to the HOF form by construction — the same XXH64 chain
  * Spark's `xxhash64` applies:
  *  - base: `xxhash64(s)` = `XXH64.hashUTF8String(s, 42)` (a NULL element
  *    leaves the running hash at the seed, i.e. contributes base 42);
  *  - derived: `xxhash64(base, h)` = `hashInt(h, hashLong(base, 42))`
  *    (children fold left with the running value as seed; `h` is an INT
  *    literal in the HOF form, so the 4-byte `hashInt` path applies);
  *  - minima use signed long ordering (`array_min` on LONG);
  *  - an EMPTY set yields `numHashes` NULL minima (`array_min([]) = NULL`).
  */
@ExpressionDescription(
  usage = "min_hash_sig(set, k) - the k seeded MinHash minima of a string array in one pass.")
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be at least 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "min_hash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_hash_sig requires an array<string> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val b0 = if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      val b1 = XXH64.hashLong(b0, 42L)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashInt(h, b1)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val b0 = ctx.freshName("b0")
      val b1 = ctx.freshName("b1")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$numHashes]);
         |} else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $b0 = $a.isNullAt($i) ? 42L
         |      : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |    long $b1 = $xxh.hashLong($b0, 42L);
         |    for (int $h = 0; $h < $numHashes; $h++) {
         |      long $v = $xxh.hashInt($h, $b1);
         |      if ($v < $mins[$h]) $mins[$h] = $v;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minHashSig(set: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(set), numHashes))
}
