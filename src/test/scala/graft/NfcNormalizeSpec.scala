package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NfcNormalize.nfcNormalize

class NfcNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def norm(values: Seq[Option[String]]): Seq[Option[String]] = {
    import spark.implicits._
    values.toDF("s").select(nfcNormalize(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("composes decomposed sequences; leaves NFC text, ASCII, CJK, null alone") {
    val decomposed = "café"       // e + COMBINING ACUTE
    val composed = "café"          // precomposed é
    val got = norm(Seq(
      Some(decomposed), Some(composed), Some("plain ascii"),
      Some("中文 text"), Some(""), None))
    assert(got == Seq(
      Some(composed), Some(composed), Some("plain ascii"),
      Some("中文 text"), Some(""), None))
    // the composition actually shortened the string (5 chars -> 4)
    assert(decomposed.length == 5 && composed.length == 4)
  }

  test("idempotent, and interpreted eval matches the codegen'd path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val decomposed = "åb́ mixed ascii é"
    val once = norm(Seq(Some(decomposed))).head.get
    assert(norm(Seq(Some(once))).head.get == once)
    // interpreted eval (direct Expression.eval, no codegen)
    val e = graft.functions.NfcNormalize(Literal(decomposed))
    assert(e.eval(null).toString == once)
    assert(graft.functions.NfcNormalize(Literal(null, e.dataType)).eval(null) == null)
  }
}
