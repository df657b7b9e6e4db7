package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AbTest

/** [[AbTest.twoProportionTest]] — the cleared-denominator integer z²
  * decision against hand-computed fixtures, plus the degenerate-cohort
  * and duplicate-conversion contracts. */
class AbTestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(
      units: Seq[(Long, Boolean)],
      convs: Seq[(Long, String)]) = {
    import spark.implicits._
    AbTest.twoProportionTest(
      units.toDF("u", "is_a"), "u", "is_a",
      convs.toDF("cu", "m"), "cu", "m")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.getBoolean(6)))).toMap
  }

  test("hand-checked verdicts: 4/4-vs-0/4 significant, 3/4-vs-2/4 not") {
    val units = (1L to 4L).map((_, true)) ++ (5L to 8L).map((_, false))
    val convs =
      (1L to 4L).map((_, "m1")) ++                  // A 4/4, B 0/4
      Seq(1L, 2L, 5L, 6L).map((_, "m2")) ++         // 2/4 vs 2/4
      Seq(1L, 2L, 3L, 5L, 6L).map((_, "m3"))        // 3/4 vs 2/4
    val got = run(units, convs)
    // m1: D = 4·4 − 0·4 = 16; delta = 16e6 // 16 = 1e6.
    // z²: 625·16²·8 = 1,280,000 > 2401·4·4·4·(8−4) = 614,656 → significant
    assert(got("m1") == ((4L, 4L, 4L, 0L, Some(1000000L), true)))
    // m2: D = 0 → delta 0, LHS 0 → not significant
    assert(got("m2") == ((4L, 2L, 4L, 2L, Some(0L), false)))
    // m3: D = 3·4 − 2·4 = 4; delta = 4e6 // 16 = 250,000.
    // 625·16·8 = 80,000 < 2401·16·5·3 = 576,240 → not significant
    assert(got("m3") == ((4L, 3L, 4L, 2L, Some(250000L), false)))
  }

  test("negative delta is sign-split truncated, not floor-rounded") {
    // A 1/3 converts, B 2/3: D = 1·3 − 2·3 = −3; |D|·1e6 // 9 = 333,333
    val units = (1L to 3L).map((_, true)) ++ (4L to 6L).map((_, false))
    val got = run(units, Seq((1L, "m"), (4L, "m"), (5L, "m")))
    assert(got("m")._5 == Some(-333333L))
  }

  test("degenerate cohort: NULL delta, false verdict; dup conversions collapse") {
    val allA = (1L to 3L).map((_, true))
    val got = run(allA, Seq((1L, "m"), (1L, "m"), (2L, "m")))
    // duplicates collapse: x_a = 2 distinct converters, not 3 rows
    assert(got("m") == ((3L, 2L, 0L, 0L, None, false)))
  }

  test("over-1e7-unit cohorts fail loudly instead of overflowing to NULL verdicts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val units = spark.range(10000001L)
      .select(col("id").as("u"), (col("id") % 2 === 0).as("is_a"))
    val convs = Seq((1L, "m")).toDF("cu", "m")
    val ex = intercept[Exception] {
      AbTest.twoProportionTest(units, "u", "is_a", convs, "cu", "m").collect()
    }
    assert(ex.getMessage.contains("1e7") || ex.getMessage.contains("pre-aggregate"),
      s"unexpected failure message: ${ex.getMessage}")
  }
}
