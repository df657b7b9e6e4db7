package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TableProfile

class TableProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("per-column stats with nulls, duplicates, and mixed types") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), None),
      (2L, None, Some(30)),
      (4L, Some("a"), Some(10))).toDF("id", "s", "v")
    val got = TableProfile.profile(df, Seq("id", "s", "v"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("id") == ((4L, 4L, 3L, "1", "4")))
    assert(got("s") == ((4L, 3L, 2L, "a", "b")))
    assert(got("v") == ((4L, 3L, 2L, "10", "30")))
  }

  test("one aggregate job: the plan has a single Expand, not per-column scans") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("a", "b")
    val q = TableProfile.profile(df, Seq("a", "b"))
    val p = q.queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(p).length
    assert(scans == 1, s"profile re-scanned the input:\n$p")
    assert(p.contains("Expand"), s"multi-distinct did not plan as Expand:\n$p")
  }
}
