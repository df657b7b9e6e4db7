package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Contingency

/** [[Contingency.chiSquaredAssoc]] — hand-computed 2×2 fixtures: perfect
  * association (χ² = n, V² = 1), exact independence (0), and the
  * constant-column NULL contract. */
class ContingencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(String, String)]) = {
    import spark.implicits._
    val r = Contingency.chiSquaredAssoc(rows.toDF("a", "b"), "a", "b")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("perfect 2x2 association: chi2 = n (ppm), V² = 1e6") {
    // cells (s0,l0)=2, (s1,l1)=2; every margin 2, n=4.
    // present cells: term = (4·2−2·2)²·1e6 div (4·2·2) = 1e6 each,
    // exp = (2·2·1e6) div 4 = 1e6 each; the two ABSENT zero cells enter
    // via the algebraic fold: Σterm − Σexp + n·1e6 = 2e6 − 2e6 + 4e6
    // = 4e6 = n ppm — the textbook χ² for a perfectly associated 2×2.
    val got = run(Seq(("s0", "l0"), ("s0", "l0"), ("s1", "l1"), ("s1", "l1")))
    assert(got == ((4L, 2L, 2L, 4000000L, Some(1000000L))))
  }

  test("exact independence: chi2_ppm = 0, v2_ppm = 0") {
    // 2×2 with all four cells equal: n·O = r·c for every cell
    val got = run(Seq(("s0", "l0"), ("s0", "l1"), ("s1", "l0"), ("s1", "l1")))
    assert(got == ((4L, 2L, 2L, 0L, Some(0L))))
  }

  test("constant column: v2 NULL (min cardinality 1), chi2 0") {
    val got = run(Seq(("s0", "l0"), ("s1", "l0"), ("s2", "l0")))
    assert(got._4 == 0L)
    assert(got._5.isEmpty)
  }

  test("NULL is an ordinary category — null-safe margin joins keep it") {
    // same perfect 2x2 as above with s1 renamed to NULL: identical stats
    val got = run(Seq(("s0", "l0"), ("s0", "l0"), (null, "l1"), (null, "l1")))
    assert(got == ((4L, 2L, 2L, 4000000L, Some(1000000L))))
  }
}
