package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Anonymity

/** [[Anonymity.kAnonymityAudit]] — hand-built QI groups: below-k
  * flagging, l-diversity counting (a size-≥k group can still leak), and
  * NULL-as-ordinary QI/sensitive semantics. */
class AnonymitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(String, String, String)], k: Long) = {
    import spark.implicits._
    Anonymity.kAnonymityAudit(
      rows.toDF("qi1", "qi2", "sens"), Seq("qi1", "qi2"), "sens", k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
  }

  test("group size, l-diversity, and below-k flag per QI group") {
    val rows = Seq(
      ("us", "a", "x"), ("us", "a", "x"), ("us", "a", "y"), // n=3, l=2
      ("us", "b", "x"),                                     // n=1, l=1
      ("de", "a", "x"), ("de", "a", "x"))                   // n=2, l=1
    val got = run(rows, k = 3)
    assert(got(("us", "a")) == ((3L, 2L, false)))
    assert(got(("us", "b")) == ((1L, 1L, true)))
    // size-below-k AND homogeneous: the double leak
    assert(got(("de", "a")) == ((2L, 1L, true)))
  }

  test("a size->=k group with one sensitive value still reports l=1") {
    val rows = Seq.fill(5)(("us", "a", "x"))
    assert(run(rows, k = 3)(("us", "a")) == ((5L, 1L, false)))
  }

  test("NULL QI values form their own group; NULL sensitive skipped by l") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Option("us"), "a", Option("x")),
      (None: Option[String], "a", Option("x")),
      (None: Option[String], "a", Option.empty[String]))
      .toDF("qi1", "qi2", "sens")
    val got = Anonymity.kAnonymityAudit(df, Seq("qi1", "qi2"), "sens", 2L)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got((Some("us"), "a")) == ((1L, 1L, true)))
    // NULL-QI group has both rows; countDistinct skips the NULL sensitive
    assert(got((None, "a")) == ((2L, 1L, false)))
  }
}
