package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho–Corasick automaton over a fixed pattern set — ONE linear
  * pass over the text finds every pattern, vs K `contains` scans (K full
  * re-reads of the corpus) or a K-row explode join (K× the rows through
  * the plan). Matching on UTF-8 bytes is exact for character semantics:
  * UTF-8 is self-synchronizing, so a byte-level occurrence can only start
  * at a codepoint boundary.
  *
  * Built once per automaton instance (KB–MB-scale pattern sets: canaries,
  * contamination markers, blocklists — model parameters, same class as
  * the BPE merge table or k-means codebooks). Dense 256-way goto rows
  * keep the hot loop a two-array-load step; the size guard documents the
  * envelope (≤ 2²⁰ nodes ≈ 1 GiB would be the wrong tool — shard the
  * pattern set instead). */
final class AhoCorasick(patterns: Array[Array[Byte]]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick: empty pattern set")
  require(patterns.forall(_.nonEmpty), "AhoCorasick: empty pattern")
  private val nodeCap = patterns.map(_.length).sum + 1
  require(nodeCap <= (1 << 20),
    s"AhoCorasick: ${nodeCap - 1} total pattern bytes exceeds the 2^20-node " +
      "envelope; shard the pattern set")

  // trie build: goto rows dense over the byte alphabet, -1 = no edge
  private val goto_ = Array.fill(nodeCap)(null: Array[Int])
  private val out = Array.fill(nodeCap)(-1) // pattern id ending here (last wins; dups pre-deduped by caller contract)
  private val fail = new Array[Int](nodeCap)
  private val exit_ = new Array[Int](nodeCap) // nearest output node via fail chain
  private var nNodes = 1
  goto_(0) = Array.fill(256)(-1)

  patterns.zipWithIndex.foreach { case (p, id) =>
    var s = 0
    p.foreach { b =>
      val c = b & 0xff
      if (goto_(s)(c) < 0) {
        goto_(nNodes) = Array.fill(256)(-1)
        goto_(s)(c) = nNodes
        nNodes += 1
      }
      s = goto_(s)(c)
    }
    out(s) = id
  }
  // BFS fail links; convert goto to a total transition function
  locally {
    val q = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val nxt = goto_(0)(c)
      if (nxt < 0) goto_(0)(c) = 0
      else { fail(nxt) = 0; q.add(nxt) }
      c += 1
    }
    while (!q.isEmpty) {
      val s = q.poll()
      exit_(s) = if (out(fail(s)) >= 0) fail(s) else exit_(fail(s))
      var c = 0
      while (c < 256) {
        val nxt = goto_(s)(c)
        if (nxt < 0) goto_(s)(c) = goto_(fail(s))(c)
        else { fail(nxt) = goto_(fail(s))(c); q.add(nxt) }
        c += 1
      }
    }
  }

  /** Sorted distinct ids of every pattern occurring in `s`. */
  def search(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val hit = new Array[Boolean](patterns.length)
    var nHit = 0
    var st = 0
    var i = 0
    while (i < bytes.length && nHit < patterns.length) {
      st = goto_(st)(bytes(i) & 0xff)
      var o = if (out(st) >= 0) st else exit_(st)
      while (o > 0) {
        if (!hit(out(o))) { hit(out(o)) = true; nHit += 1 }
        o = exit_(o)
      }
      i += 1
    }
    val ids = new Array[Any](nHit)
    var k = 0
    var id = 0
    while (id < hit.length) {
      if (hit(id)) { ids(k) = id; k += 1 }
      id += 1
    }
    new GenericArrayData(ids)
  }
}

/** `multi_contains(text)` for a literal pattern list: sorted distinct
  * indices (0-based, in pattern-list order) of the patterns occurring in
  * the text. NULL text → NULL. The automaton is a reference object in the
  * generated code — the scan stays inside whole-stage codegen, one
  * virtual call per row (the `regexp_*` pattern, not a UDF). */
case class MultiContains(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.distinct == patterns,
    "multi_contains: patterns must be non-empty and distinct")

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(UTF8String.fromString(_).getBytes).toArray)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_contains requires a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ac.search(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, a => s"$acRef.search($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiContains =
    copy(child = newChild)

  override def prettyName: String = "multi_contains"
}

object MultiContains {
  /** Column form: sorted distinct 0-based indices of `patterns` found in
    * `text`. */
  def multiContains(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiContains(Bridge.expression(text), patterns))
}
