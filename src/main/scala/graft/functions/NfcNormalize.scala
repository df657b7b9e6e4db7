package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization — custom codegen'd
  * Catalyst expression over the JDK's `java.text.Normalizer`.
  *
  * Why it exists: web text mixes precomposed ("é") and decomposed
  * ("e" + U+0301) forms of the same grapheme; exact dedup fingerprints,
  * equality joins, and tokenizers all treat them as different bytes unless
  * the corpus is canonicalized first — the standard first step of a
  * crawl-ingest pipeline. Spark ships no normalization built-in; a custom
  * expression (static JDK call inside the generated code) keeps the stage
  * inside whole-stage codegen where a Scala UDF would box rows and break
  * the span.
  *
  * The fast path costs nothing on the common case: `Normalizer.isNormalized`
  * is a cheap scan (quick-check properties), and ASCII-only strings — the
  * overwhelming bulk of a filtered English corpus — return the INPUT
  * UTF8String unchanged, no transcoding, no allocation. Only strings that
  * actually contain composition work pay String round-trip + normalize.
  *
  * NFC is canonical: idempotent, and DuckDB's `nfc_normalize` (utf8proc)
  * computes the same composition — the oracle replays it exactly.
  */
@ExpressionDescription(
  usage = "nfc_normalize(str) - canonical-composition (NFC) normalization of str.")
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NfcNormalize.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    // ASCII is NFC by definition — zero allocation for the bulk of a
    // filtered English corpus (no String round-trip at all)
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}
