package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.DatasetComparisons._
import graft.llm.CorpusDiff

class CorpusDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("classifies added / removed / changed / unchanged") {
    import spark.implicits._
    val oldC = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val newC = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("id", "text")
    val got = CorpusDiff.diff(oldC, newC, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff is exact: whitespace-only edits count as changed") {
    import spark.implicits._
    val oldC = Seq((1L, "a b")).toDF("id", "text")
    val newC = Seq((1L, "a  b")).toDF("id", "text")
    val got = CorpusDiff.diff(oldC, newC, "id", "text").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("changed"))
  }

  test("summary aggregates counts and id checksums per status") {
    import spark.implicits._
    val oldC = Seq((1L, "x"), (2L, "y"), (5L, "z")).toDF("id", "text")
    val newC = Seq((2L, "y"), (5L, "z2"), (7L, "w"), (9L, "v")).toDF("id", "text")
    val got = CorpusDiff.diffSummary(oldC, newC, "id", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "removed" -> ((1L, 1L)),
      "unchanged" -> ((1L, 2L)),
      "changed" -> ((1L, 5L)),
      "added" -> ((2L, 16L))))
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val oldC = (0L until 500L).map(i => (i, s"doc$i")).toDF("id", "text")
    val newC = (100L until 600L).map(i =>
      (i, if (i % 7 == 0) s"doc$i!" else s"doc$i")).toDF("id", "text")
    val a = CorpusDiff.diff(oldC, newC, "id", "text")
    val b = CorpusDiff.diff(oldC.repartition(13), newC.repartition(3), "id", "text")
    a.ensureDatasetEquals(b)
    // spot invariants: ids only in old are removed, only in new added
    val m = a.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 100L).forall(m(_) == "removed"))
    assert((500L until 600L).forall(m(_) == "added"))
    assert(m(105L) == "changed" && m(101L) == "unchanged")
  }
}
