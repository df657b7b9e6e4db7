package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{PiiRedact, Sampling}
import graft.testkit.DatasetComparisons._

class PiiBudgetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("redactWithCounts replaces each category and counts on raw text") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at john.doe+x@sub.example.org or 10.1.2.3"),
      (2L, "call 555-123-4567 or 555 123 4567 and 1.2.3.4 then a@b.io"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = PiiRedact.redactWithCounts(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("mail me at <EMAIL> or <IP>", 1L, 1L, 0L)))
    assert(out(2L) == (("call <PHONE> or <PHONE> and <IP> then <EMAIL>", 1L, 1L, 2L)))
    assert(out(3L) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("redaction order consumes IPv4 quads before the phone pattern can") {
    import spark.implicits._
    // "10.123.456.7890" — the dotted quad must become <IP>; the phone
    // pattern must not carve "123.456.7890" out of its middle
    val df = Seq((1L, "addr 10.123.456.789 port")).toDF("doc_id", "text")
    val got = PiiRedact.redactWithCounts(df, "doc_id", "text")
      .select("text").head().getString(0)
    assert(got == "addr <IP> port", got)
  }

  test("selectByTokenBudget keeps the greedy best prefix, boundary doc included") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10.0, 5L), (2L, 9.0, 5L), (3L, 8.0, 5L), (4L, 7.0, 5L), (5L, 6.0, 5L)
    ).toDF("id", "score", "w")
    val got = Sampling.selectByTokenBudget(docs, "score", "id", "w", budget = 12L)
      .select("id").collect().map(_.getLong(0)).toSet
    // cumulative-before: 0, 5, 10, 15, 20 → kept while < 12 → ids 1,2,3
    assert(got == Set(1L, 2L, 3L))
    // partitioning-independent
    val b = Sampling.selectByTokenBudget(
      docs.repartition(7), "score", "id", "w", budget = 12L).select("id")
    b.ensureDatasetEquals(docs.filter(col("id") <= 3).select("id"))
  }

  test("assignSplit is disjoint, exhaustive, and stable under corpus growth") {
    import spark.implicits._
    val small = (1L to 400L).toDF("id")
    val big = (1L to 1000L).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = Sampling.assignSplit(small, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplit(big, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // growth stability: no existing row changes split when rows are added
    assert(a.forall { case (id, s) => b(id) == s })
    assert(b.values.toSet == Set("train", "val", "test"))
    val frac = b.values.count(_ == "train").toDouble / b.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(small, "id", Seq(("a", 0.5), ("b", 0.6)))
    }
  }

  test("assignSplitByGroup keeps linked rows in one split (no train/test leakage)") {
    import spark.implicits._
    val rows = (1L to 300L).toDF("id")
    // a chain 1-2-3 plus scattered pairs linking distant ids
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 250L), (77L, 142L), (5L, 299L))
      .toDF("id_a", "id_b")
    val out = Sampling.assignSplitByGroup(rows, "id", pairs,
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Seq((1L, 2L), (2L, 3L), (10L, 250L), (77L, 142L), (5L, 299L)).foreach {
      case (x, y) => assert(out(x) == out(y), s"pair ($x,$y) split across splits")
    }
    assert(out.size == 300)
  }

  test("selectByTokenBudget breaks score ties deterministically by the tie column") {
    import spark.implicits._
    val docs = Seq((10L, 1.0, 4L), (11L, 1.0, 4L), (12L, 1.0, 4L))
      .toDF("id", "score", "w")
    val got = Sampling.selectByTokenBudget(docs, "score", "id", "w", budget = 8L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L)) // lowest ids win the tie
  }
}
