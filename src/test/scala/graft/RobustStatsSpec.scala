package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobustStats

class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // driver-side reference: the house lower discrete quantile
  private def med(vs: Seq[Long]): Long = {
    val s = vs.sorted
    s(math.max(1, math.ceil(s.size * 0.5).toInt) - 1)
  }

  test("median, MAD, and deviation match the sorted reference per group") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 1 to (g.hashCode.abs % 30 + 5)
    } yield (g, rng.nextInt(1000).toLong + (if (i == 1) 100000L else 0L))
    val got = RobustStats.withRobustStats(rows.toDF("g", "v"), Seq("g"), "v")
      .select("g", "v", "med", "mad", "dev")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byG.foreach { case (g, vs) =>
      val m = med(vs)
      val devs = vs.map(v => math.abs(v - m))
      val ma = med(devs)
      vs.foreach { v =>
        assert(got((g, v)) == ((m, ma, math.abs(v - m))),
          s"stats of ($g, $v)")
      }
    }
  }

  test("outliers flags exactly |x - med| > t*MAD; giant value caught") {
    import spark.implicits._
    // group a: med=11 (3rd of 5), devs {2,1,0,1,99989} -> mad=1; only
    // 100000 exceeds 3*mad
    val df = Seq(("a", 9L), ("a", 10L), ("a", 11L), ("a", 12L),
      ("a", 100000L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val got = RobustStats.outliers(df, Seq("g"), "v", threshold = 3L)
      .select("g", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 100000L)))
  }

  test("zero-MAD group flags every off-median value") {
    import spark.implicits._
    val df = Seq(("c", 7L), ("c", 7L), ("c", 7L), ("c", 8L)).toDF("g", "v")
    val got = RobustStats.outliers(df, Seq("g"), "v", threshold = 3L)
      .select("v").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(8L))
  }

  test("a NULL group key is an ordinary group") {
    import spark.implicits._
    val df = Seq((Option("a"), 1L), (Option("a"), 2L), (Option("a"), 50L),
      (Option.empty[String], 3L), (None: Option[String], 4L),
      (None: Option[String], 900L)).toDF("g", "v")
    val got = RobustStats.withRobustStats(df, Seq("g"), "v")
    assert(got.count() == 6)
    val nullG = got.filter("g IS NULL").select("med", "mad")
      .distinct().collect()
    // null group values {3,4,900}: med=4, devs {1,0,896} -> mad=1
    assert(nullG.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((4L, 1L)))
  }

  test("global (no group columns) robust stats work") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L, 1000L).toDF("v")
    val got = RobustStats.outliers(df, Seq(), "v", threshold = 3L)
      .select("v").collect().map(_.getLong(0))
    // med=3 (ceil(2.5)=3rd of sorted), devs {2,1,0,1,997} -> mad=1
    assert(got.toSeq == Seq(1000L))
  }

  test("giniIndex: equal values gini 0, single holder ~2/3 at n=3, tie-order invariant") {
    import spark.implicits._
    val df = Seq(
      ("eq", 1L, 5L), ("eq", 2L, 5L), ("eq", 3L, 5L),
      ("one", 4L, 0L), ("one", 5L, 0L), ("one", 6L, 9L))
      .toDF("g", "id", "v")
    val got = RobustStats.giniIndex(df, Seq("g"), "v", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("eq") == ((3L, 15L, 0L, 0L)))
    // one holder: G = 2·(3·9) − 4·9 = 18; ppm = 18e6 div 27 = 666666
    assert(got("one") == ((3L, 9L, 18L, 666666L)))
    // duplicate values in any id order give the same sums
    val dup = Seq(("d", 1L, 7L), ("d", 2L, 7L), ("d", 3L, 1L)).toDF("g", "id", "v")
    val dup2 = Seq(("d", 3L, 7L), ("d", 1L, 7L), ("d", 2L, 1L)).toDF("g", "id", "v")
    assert(
      RobustStats.giniIndex(dup, Seq("g"), "v", "id").select("gini_num").head() ==
        RobustStats.giniIndex(dup2, Seq("g"), "v", "id").select("gini_num").head())
  }

  test("coverageCurve: hand-checked tiny corpus") {
    import spark.implicits._
    // tokens: a×4, b×2, c×1 → total 7; top-1 covers 4, top-2 covers 6
    val df = Seq((1L, "a a b"), (2L, "a a b c")).toDF("doc_id", "text")
    val got = graft.llm.Vocab.coverageCurve(df, "text", Seq(1, 2, 5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 4L, 7L, 571428L),
      (2L, 6L, 7L, 857142L),
      (5L, 7L, 7L, 1000000L)))
  }

  test("benfordAudit: exact digit census, sub-1 and NULL excluded, ppm math") {
    import spark.implicits._
    val df = Seq(Some(1.5), Some(19.99), Some(2.0), Some(0.5), None,
      Some(900.1), Some(95.0)).toDF("v")
    val got = RobustStats.benfordAudit(df, "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // digits of {1.5, 19.99, 2.0, 900.1, 95.0} → 1,1,2,9,9 over total 5
    assert(got.keySet == Set("1", "2", "9"))
    assert(got("1") == ((2L, 400000L, 301030L, 98970L)))
    assert(got("2") == ((1L, 200000L, 176091L, 23909L)))
    assert(got("9") == ((2L, 400000L, 45757L, 354243L)))
  }

  test("winsorizedStats: exact order-stat clamp caps the outlier's leverage") {
    import spark.implicits._
    // g: 1..10 → p10 = rank ceil(1) = 1, p90 = rank ceil(9) = 9;
    // only 10 clamps (→9): sum 55−10+9 = 54 → mean 5_400_000 ppm
    // h: huge outlier → clamped to p90, mean barely moves
    val rows = (1L to 10L).map(("g", _)) ++
      Seq(("h", 1L), ("h", 2L), ("h", 3L), ("h", 1000000L))
    val got = RobustStats.winsorizedStats(rows.toDF("src", "v"), Seq("src"), "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("g") == ((10L, 1L, 9L, 0L, 1L, 5400000L)))
    // h: n=4, p10 = rank ceil(0.4)=1 → 1, p90 = rank ceil(3.6)=4 → 1000000
    // nothing clamps (p90 IS the outlier at this tiny n) — documents the
    // order-stat rule honestly: winsorizing needs n ≥ ~1/(1−f)
    assert(got("h") == ((4L, 1L, 1000000L, 0L, 0L, ((1000006L * 1000000L) / 4L))))
  }

  test("winsorizedStats: NULL group is an ordinary group (null-safe join back)") {
    import spark.implicits._
    val rows = Seq((Option.empty[String], 5L), (None, 7L), (Some("a"), 3L))
    val got = RobustStats.winsorizedStats(
      rows.toDF("src", "v"), Seq("src"), "v")
    assert(got.count() == 2)
    assert(got.filter(got("src").isNull).head().getLong(1) == 2L)
  }
}
