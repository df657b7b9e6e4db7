package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcApply
import graft.testkit.DatasetComparisons._

class CdcApplySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("last-writer-wins: upsert, delete, insert, untouched; churned key") {
    import spark.implicits._
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "v")
    val log = Seq(
      (2L, "two'", "U", 10L),
      (2L, "two''", "U", 20L),   // later — must win over seq 10
      (3L, "x", "D", 5L),        // delete key 3
      (4L, "four", "I", 1L),     // brand-new key
      (5L, "five", "U", 1L),     // U on absent key still upserts
      (6L, "gone", "I", 1L),
      (6L, "gone", "D", 2L))     // inserted then deleted → absent
      .toDF("k", "v", "op", "seq")
    val got = CdcApply.applyChangelog(base, log, Seq("k"), Seq("v"))
    val want = Seq((1L, "one"), (2L, "two''"), (4L, "four"), (5L, "five"))
      .toDF("k", "v")
    got.ensureDatasetEquals(want)
    // partitioning-independence
    CdcApply.applyChangelog(base.repartition(5), log.repartition(7), Seq("k"), Seq("v"))
      .ensureDatasetEquals(want)
  }

  test("applying an empty-effect changelog is identity; replay is idempotent") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val log = Seq((1L, "a2", "U", 1L)).toDF("k", "v", "op", "seq")
    val once = CdcApply.applyChangelog(base, log, Seq("k"), Seq("v"))
    val twice = CdcApply.applyChangelog(once, log, Seq("k"), Seq("v"))
    once.ensureDatasetEquals(twice)
  }

  test("plan: bounded partial top_k for the per-key argmax, one outer join, no Window") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "v")
    val log = Seq((1L, "a2", "U", 1L)).toDF("k", "v", "op", "seq")
    val p = CdcApply.applyChangelog(base, log, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_top_k"),
      s"latest-op extraction must map-side combine:\n$p")
    assert("FullOuter".r.findAllIn(p).size == 1,
      s"expected exactly one full-outer join:\n$p")
    assert(!p.contains("Window"), s"cdc apply must not use windows:\n$p")
  }
}
