package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Correlation

/** [[Correlation.corrMatrixExact]] — hand-computed moment fixtures: the
  * exact-linear, anti-linear, and independent cases, plus the
  * zero-variance NULL contract and pair-count shape. */
class CorrelationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(Long, Long, Long)]): Map[(String, String), (Long, Long, Option[Long])] = {
    import spark.implicits._
    Correlation.corrMatrixExact(rows.toDF("x", "y", "z"), Seq("x", "y", "z"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
  }

  test("exact linear y=2x gives corr_sign 1 and r2_ppm exactly 1e6") {
    // y = 2x: cov = 2·vx, vy = 4·vx → a = (2vx·1000) div vx = 2000,
    // b = (2vx·1000) div 4vx = 500 → r² ppm = 2000·500 = 1,000,000 exact
    val got = run(Seq((1L, 2L, 5L), (2L, 4L, 5L), (3L, 6L, 5L)))
    assert(got(("x", "y")) == ((3L, 1L, Some(1000000L))))
  }

  test("anti-linear y=-x gives corr_sign -1, r2_ppm 1e6") {
    val got = run(Seq((1L, -1L, 0L), (2L, -2L, 1L), (3L, -3L, 0L)))
    assert(got(("x", "y"))._2 == -1L)
    assert(got(("x", "y"))._3 == Some(1000000L))
  }

  test("constant column reports NULL r2 and sign 0 against any metric") {
    val got = run(Seq((1L, 2L, 5L), (2L, 4L, 5L), (3L, 6L, 5L)))
    assert(got(("x", "z")) == ((3L, 0L, None)))
    assert(got(("y", "z")) == ((3L, 0L, None)))
  }

  test("hand moments: x=(0,1,2), y=(0,0,3) — truncation is per division") {
    // n=3, Σx=3, Σy=3, Σx²=5, Σy²=9, Σxy=6
    // cov = 18−9 = 9; vx = 15−9 = 6; vy = 27−9 = 18
    // a = 9000 div 6 = 1500; b = 9000 div 18 = 500 → r2 = 750,000
    // (true r² = 81/108 = 0.75 — the two-step division is exact here)
    val got = run(Seq((0L, 0L, 0L), (1L, 0L, 1L), (2L, 3L, 2L)))
    assert(got(("x", "y")) == ((3L, 1L, Some(750000L))))
  }

  test("all unordered pairs appear exactly once") {
    val got = run(Seq((1L, 2L, 3L), (4L, 5L, 6L)))
    assert(got.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
  }

  private def spearman(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val r = Correlation.spearmanExact(
      rows.toDF("x", "y", "id"), "x", "y", "id").collect().head
    (r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("spearman: monotone-nonlinear y=x³ scores ρ²=1e6 where Pearson doesn't") {
    val rows = Seq.tabulate(6)(i => (i.toLong, (i.toLong - 3) *
      (i.toLong - 3) * (i.toLong - 3), i.toLong))
    assert(spearman(rows.map { case (x, y, id) => (x, y, id) }) ==
      ((6L, 1L, Some(1000000L))))
    // same data through Pearson: strictly below 1e6 (nonlinear)
    import spark.implicits._
    val p = Correlation.corrMatrixExact(
      rows.toDF("x", "y", "id").select("x", "y"), Seq("x", "y"))
      .collect().head
    assert(p.getLong(4) < 1000000L)
  }

  test("spearman: reversal gives sign -1, ρ²=1e6; ties broken by id deterministically") {
    assert(spearman(Seq((1L, 9L, 1L), (2L, 5L, 2L), (3L, 1L, 3L))) ==
      ((3L, -1L, Some(1000000L))))
    // all-tied x: ranks follow id on both axes when values tie
    val tied = spearman(Seq((7L, 10L, 1L), (7L, 20L, 2L), (7L, 30L, 3L)))
    assert(tied == ((3L, 1L, Some(1000000L))))
  }
}
