package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles.groupQuantiles

class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def reference(vals: Seq[Double], f: Double): Double = {
    val sorted = vals.sorted
    sorted(math.max(1, math.ceil(vals.size * f).toLong).toInt - 1)
  }

  test("per-group order-statistic quantiles match the sorted reference") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 1 to (g.hashCode.abs % 40 + 3)
    } yield (g, rng.nextDouble() * 100)
    val got = groupQuantiles(rows.toDF("g", "v"), Seq("g"), "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    byG.foreach { case (g, vs) =>
      val (p50, p90, n) = got(g)
      assert(n == vs.size)
      assert(p50 == reference(vs, 0.5), s"p50 of $g")
      assert(p90 == reference(vs, 0.9), s"p90 of $g")
    }
  }

  test("single-row groups, ties, and nulls") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(5.0)), ("b", Some(1.0)), ("b", Some(1.0)), ("b", Some(2.0)),
      ("c", None), ("c", Some(3.0))
    ).toDF("g", "v")
    val got = groupQuantiles(df, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got("a") == ((5.0, 1L)))
    assert(got("b") == ((1.0, 3L)))   // ceil(3*0.5)=2nd smallest of (1,1,2) = 1
    assert(got("c") == ((3.0, 1L)))   // null values excluded from rank and count
  }

  test("a NULL group key is an ordinary group, not silently dropped") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 5.0), (Some("a"), 7.0),
      (None: Option[String], 1.0), (None: Option[String], 2.0), (None: Option[String], 3.0)
    ).toDF("g", "v")
    val rows = groupQuantiles(df, Seq("g"), "v", Seq(0.5)).collect()
    assert(rows.length == 2, "expected the NULL group to survive the totals join")
    val got = rows.map(r => Option(r.getString(0)) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got(Some("a")) == ((5.0, 2L)))  // ceil(2*0.5)=1st smallest
    assert(got(None) == ((2.0, 3L)))       // ceil(3*0.5)=2nd smallest of (1,2,3)
  }

  test("fractions rounding to the same percent get distinct column names") {
    import graft.operators.Quantiles.quantileName
    assert(quantileName(0.5) == "p50")
    assert(quantileName(1.0) == "p100")
    assert(quantileName(0.995) == "p99_5")   // not p100
    assert(quantileName(0.251) == "p25_1")   // not p25
    assert(quantileName(0.25) == "p25")

    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    val cols = groupQuantiles(df, Seq("g"), "v", Seq(0.995, 1.0, 0.25, 0.251)).columns
    assert(cols.toSeq == Seq("g", "p99_5", "p100", "p25", "p25_1", "n"))
  }

  test("binnedQuantiles: within binWidth below the exact quantile, bin-edge answers") {
    import spark.implicits._
    val rng = new scala.util.Random(71)
    val rows = (1 to 500).map(i => (s"g${i % 3}", rng.nextDouble() * 100.0))
    val df = rows.toDF("g", "v")
    val got = graft.operators.Quantiles.binnedQuantiles(
      df, Seq("g"), "v", binWidth = 10.0, Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // driver-side reference: exact order statistic, then its bin's lower edge
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byG; (q, idx) <- Seq(0.5 -> 0, 0.9 -> 1)) {
      val exact = vs(math.max(1, math.ceil(vs.size * q).toInt) - 1)
      val gotV = if (idx == 0) got(g)._1 else got(g)._2
      assert(gotV == math.floor(exact / 10.0) * 10.0,
        s"$g q=$q: got $gotV, exact $exact")
      assert(gotV <= exact && exact < gotV + 10.0, s"$g q=$q error bound")
    }
  }

  test("binnedQuantiles handles negative values and single-element groups") {
    import spark.implicits._
    val df = Seq(("a", -15.0), ("a", -5.0), ("a", 5.0), ("b", 42.0))
      .toDF("g", "v")
    val got = graft.operators.Quantiles.binnedQuantiles(
      df, Seq("g"), "v", binWidth = 10.0, Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // a: n=3, target 2 → cum bins (-2:1, -1:2, 0:3) → bin -1 → -10.0
    assert(got == Set(("a", -10.0, 3L), ("b", 40.0, 1L)))
  }
}
