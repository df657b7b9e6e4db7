package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin
import graft.testkit.DatasetComparisons._

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def points: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 99L),
      (4L, "b", 10L), (5L, "b", 1000L), (6L, "c", 7L)
    ).toDF("p_id", "pk", "t")
  }

  private def intervals: DataFrame = {
    import spark.implicits._
    Seq(
      (101L, "a", 0L, 10L),     // [0,10): catches t=5, not t=10
      (102L, "a", 10L, 11L),    // [10,11): exactly t=10
      (103L, "a", 0L, 1000L),   // wide interval spanning many bins
      (104L, "b", 5L, 15L),
      (105L, "b", 15L, 5L),     // degenerate end<=start: matches nothing
      (106L, "z", 0L, 100L)     // key with no points
    ).toDF("i_id", "ik", "lo", "hi")
  }

  /** Quadratic reference: plain conditional join. */
  private def reference(keyed: Boolean): DataFrame = {
    val cond0 = col("t") >= col("lo") && col("t") < col("hi")
    val cond = if (keyed) col("pk") === col("ik") && cond0 else cond0
    points.join(intervals, cond)
  }

  test("keyed range join matches the quadratic reference, no duplicate pairs") {
    val got = RangeJoin.rangeJoin(points, "t", intervals, "lo", "hi",
      binWidth = 8, equiKeys = Seq("pk" -> "ik"))
    got.ensureDatasetEquals(reference(keyed = true))
  }

  test("unkeyed range join matches; intervals spanning many bins match once") {
    val got = RangeJoin.rangeJoin(points, "t", intervals, "lo", "hi", binWidth = 3)
    got.ensureDatasetEquals(reference(keyed = false))
  }

  test("binWidth larger than every interval still matches exactly") {
    val got = RangeJoin.rangeJoin(points, "t", intervals, "lo", "hi",
      binWidth = 1000000, equiKeys = Seq("pk" -> "ik"))
    got.ensureDatasetEquals(reference(keyed = true))
  }

  test("negative coordinates bin by floor division, not truncation") {
    import spark.implicits._
    val pts = Seq((1L, -5L), (2L, -1L), (3L, 0L), (4L, -100L)).toDF("p_id", "t")
    val ivl = Seq((10L, -8L, -2L), (11L, -2L, 3L), (12L, -101L, -99L))
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, "t", ivl, "lo", "hi", binWidth = 7)
    val want = pts.join(ivl, col("t") >= col("lo") && col("t") < col("hi"))
    got.ensureDatasetEquals(want)
  }

  test("values beyond 2^53 (nanosecond epochs) bin exactly") {
    import spark.implicits._
    // adjacent nano-scale longs where double rounding would merge/shift bins
    val base = (1L << 60) + 123456789L
    val pts = Seq((1L, base), (2L, base + 1L), (3L, base + 999L), (4L, -base))
      .toDF("p_id", "t")
    val ivl = Seq((10L, base, base + 2L), (11L, base + 500L, base + 1000L),
      (12L, -base - 1L, -base + 1L)).toDF("i_id", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, "t", ivl, "lo", "hi", binWidth = 1000L)
    val want = pts.join(ivl, col("t") >= col("lo") && col("t") < col("hi"))
    got.ensureDatasetEquals(want)
  }

  test("self-join of one source disambiguates sides") {
    import spark.implicits._
    val ev = Seq((1L, 10L), (2L, 12L), (3L, 30L)).toDF("id", "ts")
    val pts = ev.select(col("id").as("e_id"), col("ts"))
    val ivl = ev.select(col("id").as("i_id"), col("ts").as("s"),
      (col("ts") + 5L).as("e"))
    val got = RangeJoin.rangeJoin(pts, "ts", ivl, "s", "e", binWidth = 4)
    val want = pts.join(ivl, col("ts") >= col("s") && col("ts") < col("e"))
    got.ensureDatasetEquals(want)
  }

  // ---- intervalOverlapJoin ----

  private def leftIntervals: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a", 0L, 10L),
      (2L, "a", 10L, 20L),   // touches interval 1 at 10: NOT an overlap
      (3L, "a", 5L, 100L),   // spans many bins
      (4L, "b", -50L, -10L), // negative coordinates
      (5L, "b", 7L, 3L),     // degenerate: matches nothing
      (6L, "c", 0L, 1L)
    ).toDF("l_id", "lk", "ls", "le")
  }

  private def rightIntervals: DataFrame = {
    import spark.implicits._
    Seq(
      (101L, "a", 9L, 12L),   // overlaps 1 and 2 and 3
      (102L, "a", 20L, 30L),  // touches 2 at 20: NOT an overlap; inside 3
      (103L, "a", 200L, 300L),// overlaps nothing
      (104L, "b", -20L, 0L),  // overlaps 4
      (105L, "b", 1L, 2L),    // would overlap degenerate 5's [3,7) range? no
      (106L, "z", 0L, 100L)   // key with no left intervals
    ).toDF("r_id", "rk", "rs", "re")
  }

  private def overlapReference(keyed: Boolean): DataFrame = {
    val cond0 = col("ls") < col("re") && col("rs") < col("le") &&
      col("ls") < col("le") && col("rs") < col("re")
    val cond = if (keyed) col("lk") === col("rk") && cond0 else cond0
    leftIntervals.join(rightIntervals, cond)
  }

  test("keyed interval overlap join matches the quadratic reference, each pair once") {
    val got = RangeJoin.intervalOverlapJoin(leftIntervals, "ls", "le",
      rightIntervals, "rs", "re", binWidth = 8, equiKeys = Seq("lk" -> "rk"))
    got.ensureDatasetEquals(overlapReference(keyed = true))
  }

  test("unkeyed interval overlap join matches across many shared bins (no dup pairs)") {
    val got = RangeJoin.intervalOverlapJoin(leftIntervals, "ls", "le",
      rightIntervals, "rs", "re", binWidth = 3)
    got.ensureDatasetEquals(overlapReference(keyed = false))
  }

  test("interval overlap join: binWidth larger than every interval still exact") {
    val got = RangeJoin.intervalOverlapJoin(leftIntervals, "ls", "le",
      rightIntervals, "rs", "re", binWidth = 1000000,
      equiKeys = Seq("lk" -> "rk"))
    got.ensureDatasetEquals(overlapReference(keyed = true))
  }

  test("interval overlap join beyond 2^53 bins exactly") {
    import spark.implicits._
    val base = (1L << 60) + 987654321L
    val l = Seq((1L, base, base + 1000L), (2L, -base - 1000L, -base))
      .toDF("l_id", "ls", "le")
    val r = Seq((10L, base + 999L, base + 2000L), (11L, base + 1000L, base + 1001L),
      (12L, -base - 500L, -base + 1L)).toDF("r_id", "rs", "re")
    val got = RangeJoin.intervalOverlapJoin(l, "ls", "le", r, "rs", "re",
      binWidth = 700L)
    val want = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
    got.ensureDatasetEquals(want)
  }
}
