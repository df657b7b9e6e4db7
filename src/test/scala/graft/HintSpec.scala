package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.DatasetComparisons._

/** The `hint("skew")` analyzer rewrite ([[graft.skew.ResolveSkewHint]],
  * injected via GraftExtensions). */
class HintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // a hot key heavy enough that the DEFAULT SkewJoinConf (rf = 1e-3,
  // replication from freq ≥ ~2000) actually fragments it
  private def lhs = {
    import spark.implicits._
    ((1 to 30000).map(i => (1L, s"h$i")) ++
      (1 to 500).map(i => (i.toLong + 1, s"u$i"))).toDF("k", "lv")
  }
  private def rhs = {
    import spark.implicits._
    ((1 to 10).map(i => (1L, s"r$i")) ++
      (1 to 500).map(i => (i.toLong + 1, s"w$i"))).toDF("k", "rv")
  }

  test("hint(skew) on a using-join rewrites to the salted plan, same result") {
    val hinted = lhs.hint("skew").join(rhs, Seq("k"))
    hinted.ensureDatasetEquals(lhs.join(rhs, Seq("k")))
    val p = hinted.queryExecution.executedPlan.toString
    assert(p.contains("__graft_salt"), s"no salted join keys in plan:\n$p")
  }

  test("hint(skew) on a raw equi-join keeps both key columns and all rows") {
    val l = lhs
    val r = rhs
    val hinted = l.hint("skew").join(r, l("k") === r("k"))
    val plain = l.join(r, l("k") === r("k"))
    assert(hinted.columns.toSeq == plain.columns.toSeq)
    hinted.ensureDatasetEquals(plain)
    assert(hinted.queryExecution.executedPlan.toString.contains("__graft_salt"))
  }

  test("hint(skew) on the right input works; unsupported shapes fall back") {
    val rightHinted = lhs.join(rhs.hint("skew"), Seq("k"))
    rightHinted.ensureDatasetEquals(lhs.join(rhs, Seq("k")))
    assert(rightHinted.queryExecution.executedPlan.toString.contains("__graft_salt"))
    // outer join: hint stripped, plain semantics, no salting
    val outer = lhs.hint("skew").join(rhs, Seq("k"), "left_outer")
    outer.ensureDatasetEquals(lhs.join(rhs, Seq("k"), "left_outer"))
    assert(!outer.queryExecution.executedPlan.toString.contains("__graft_salt"))
    // non-equi condition: hint stripped, plain semantics
    val l = lhs
    val r = rhs
    val nonEqui = l.hint("skew").join(r, l("k") < r("k"))
    assert(nonEqui.count() == l.join(r, l("k") < r("k")).count())
  }
}
