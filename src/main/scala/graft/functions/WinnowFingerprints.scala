package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All DISTINCT winnowing fingerprints (Schleimer/Wilkerson/Aiken, the
  * MOSS sliding-window-minima scheme) of a normalized text in ONE pass —
  * custom codegen'd Catalyst expression.
  *
  * Why custom: the relational formulation (posexplode the k-gram hash
  * stream → per-doc `min` window over positions → distinct) pays a full
  * shuffle-sort of every gram row — ~n rows per n-char document through an
  * exchange and a per-doc window sort, just to keep ~2n/window distinct
  * values. This expression computes the rolling k-gram xxhash64 stream and
  * its sliding-window minima (monotonic deque, O(n) total) inside the
  * scan projection, so the plan ships only the distinct fingerprints —
  * and an expression-level HOF formulation is no alternative:
  * CollapseProject inlines the normalization into a per-position lambda
  * and re-evaluates it per gram (the O(n²) trap documented at
  * [[graft.llm.TextStats.gramHashes]]).
  *
  * Bit-identical to the relational form by construction:
  *  - gram stream: for p in 1..max(numChars−k+1, 1), `xxhash64(substr(norm,
  *    p, k))` — including the whole-string gram of a shorter-than-k doc;
  *  - per-position fingerprint: `min` over gram positions [p, p+window−1]
  *    clipped at the end of the stream (Spark's `rowsBetween(currentRow,
  *    window−1)` semantics — trailing windows shrink, so suffix minima are
  *    fingerprints too);
  *  - output: the distinct minima, sorted ascending (the relational form
  *    applies `.distinct()` across (id, fp) rows — set-equal).
  *
  * ASCII fast path: one `hashUnsafeBytes` per gram straight over the input
  * bytes — no per-gram UTF8String allocation (normalized corpus text is
  * ASCII by construction; non-ASCII falls back to `substringSQL`, same
  * hashes).
  */
@ExpressionDescription(
  usage = "winnow_fps(norm, k, window) - distinct winnowing fingerprints of the k-gram hash stream.")
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  require(k >= 1, "k must be at least 1")
  require(window >= 1, "window must be at least 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.WinnowFingerprints.compute($a, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Static entry shared by eval and generated code: the sorted distinct
    * sliding-window minima of the rolling k-gram hash stream. */
  def compute(s: UTF8String, k: Int, window: Int): ArrayData = {
    val chars = s.numChars()
    val n = math.max(chars - (k - 1), 1)
    // rolling gram hashes — identical to xxhash64(substr(s, p, k))
    val hashes = new Array[Long](n)
    if (s.numBytes() == chars) {
      // ASCII: char p (1-based) starts at byte p−1; grams are k bytes
      // (or the whole string when it is shorter than k)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = math.min(k, chars)
      var p = 0
      while (p < n) {
        hashes(p) = XXH64.hashUnsafeBytes(base, off + p, len, 42L)
        p += 1
      }
    } else {
      var p = 0
      while (p < n) {
        hashes(p) = XXH64.hashUTF8String(s.substringSQL(p + 1, k), 42L)
        p += 1
      }
    }
    // sliding minima over [p, p+window−1] clipped at n−1: monotonic deque,
    // O(n); consecutive duplicates dropped on the fly (a window min
    // repeats for up to `window` positions)
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var q = 0
    val mins = new Array[Long](n)
    var m = 0
    var p = 0
    while (p < n) {
      val hi = math.min(p + window - 1, n - 1)
      while (q <= hi) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(q)) tail -= 1
        dq(tail) = q
        tail += 1
        q += 1
      }
      while (dq(head) < p) head += 1
      val v = hashes(dq(head))
      if (m == 0 || mins(m - 1) != v) { mins(m) = v; m += 1 }
      p += 1
    }
    // distinct ascending (consecutive-dedup above only removes runs)
    java.util.Arrays.sort(mins, 0, m)
    var out = 0
    var i = 0
    while (i < m) {
      if (out == 0 || mins(out - 1) != mins(i)) { mins(out) = mins(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, out))
  }

  def winnowFingerprints(norm: Column, k: Int, window: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(norm), k, window))
}
