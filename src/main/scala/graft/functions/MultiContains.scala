package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
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

  private val patCharLens: Array[Int] =
    patterns.map(p => UTF8String.fromBytes(p).numChars())

  /** First occurrence of each pattern as `(id, pos)` rows, `pos` the
    * 1-based CHARACTER position of the match start (SQL `instr`
    * convention, engine-portable) — char positions are tracked by
    * counting non-continuation bytes during the same single scan. Rows
    * ordered by id. */
  def searchPositions(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val firstPos = Array.fill(patterns.length)(-1)
    var nHit = 0
    var st = 0
    var i = 0
    var chars = 0 // chars consumed up to and including byte i-1
    while (i < bytes.length && nHit < patterns.length) {
      // a UTF-8 continuation byte is 0b10xxxxxx; everything else starts a char
      if ((bytes(i) & 0xc0) != 0x80) chars += 1
      st = goto_(st)(bytes(i) & 0xff)
      var o = if (out(st) >= 0) st else exit_(st)
      while (o > 0) {
        val id = out(o)
        if (firstPos(id) < 0) {
          firstPos(id) = chars - patCharLens(id) + 1
          nHit += 1
        }
        o = exit_(o)
      }
      i += 1
    }
    val rows = new Array[Any](nHit)
    var k = 0
    var id = 0
    while (id < firstPos.length) {
      if (firstPos(id) >= 0) { rows(k) = InternalRow(id, firstPos(id)); k += 1 }
      id += 1
    }
    new GenericArrayData(rows)
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

  /** Column form of [[MultiFind]]: `array<struct<id:int, pos:int>>` —
    * first occurrence of each found pattern, `pos` 1-based char position
    * (SQL `instr` convention). */
  def multiFind(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiFind(Bridge.expression(text), patterns))
}

/** `multi_find(text)`: first occurrence of each pattern as `(id, pos)`
  * with `pos` the 1-based CHARACTER position — the span-extraction form
  * of [[MultiContains]], same single Aho–Corasick pass (char positions
  * fall out of counting non-continuation bytes during the byte scan). */
case class MultiFind(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty && patterns.distinct == patterns,
    "multi_find: patterns must be non-empty and distinct")

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(UTF8String.fromString(_).getBytes).toArray)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_find requires a string column, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ac.searchPositions(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAcF", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, a => s"$acRef.searchPositions($a)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiFind =
    copy(child = newChild)

  override def prettyName: String = "multi_find"
}
