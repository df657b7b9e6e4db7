package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RollupMaintain

/** [[RollupMaintain.applyAggDelta]] — the incremental-maintenance
  * equivalence (delta-applied rollup ≡ full re-aggregate), zero-count
  * group drop, negative-count and unknown-op loud failures, NULL-key
  * groups, and delta-only group insertion. */
class RollupMaintainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  private def rollup(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("v"))
  }

  private def delta(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v", "op")
  }

  private def got(base: Seq[(String, Long)], d: Seq[(String, Long, String)]) =
    RollupMaintain.applyAggDelta(
      rollup(base), delta(d), Seq("k"), "n", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("delta-applied rollup equals the full re-aggregate") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L))
    val d = Seq(("a", 10L, "D"), ("a", 7L, "I"), ("c", 1L, "I"))
    // surviving facts: a→(20,7), b→(5), c→(1)
    assert(got(base, d) ==
      Set(("a", 2L, 27L), ("b", 1L, 5L), ("c", 1L, 1L)))
  }

  test("a fully-retracted group drops from the rollup") {
    assert(got(Seq(("a", 3L), ("b", 4L)), Seq(("b", 4L, "D"))) ==
      Set(("a", 1L, 3L)))
  }

  test("net-zero delta on an absent group leaves no residue") {
    assert(got(Seq(("a", 1L)), Seq(("x", 9L, "I"), ("x", 9L, "D"))) ==
      Set(("a", 1L, 1L)))
  }

  test("retracting from a group the rollup never absorbed raises") {
    val ex = intercept[Exception] {
      got(Seq(("a", 1L)), Seq(("x", 9L, "D")))
    }
    assert(ex.getMessage.contains("negative") ||
      ex.getCause != null && ex.getCause.getMessage.contains("negative"))
  }

  test("unknown op raises") {
    assertThrows[Exception] {
      got(Seq(("a", 1L)), Seq(("a", 1L, "U")))
    }
  }

  test("NULL is an ordinary group key (null-safe join + key coalesce)") {
    import spark.implicits._
    val base = Seq((Option("a"), 1L), (None, 2L), (None, 3L))
      .toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("v"))
    val d = Seq((None: Option[String], 4L, "I")).toDF("k", "v", "op")
    val out = RollupMaintain.applyAggDelta(base, d, Seq("k"), "n", Seq("v"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set((Some("a"), 1L, 1L), (None, 3L, 9L)))
  }
}
