package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cusum.cusumDrift

class CusumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(String, Long, Long)], h: Long)
      : Map[(String, Long), (Long, Boolean)] = {
    import spark.implicits._
    cusumDrift(rows.toDF("g", "step", "n").repartition(7),
      Seq("g"), "step", "n", h)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
  }

  test("level shift accumulates linearly and trips h mean-steps; spike-free series doesn't") {
    // "a": 10,10,10 then 40,40,40 — mean 25, drift D(micro) =
    // [-15,-30,-45,-30,-15,0]e6, running-min floor -45e6 →
    // cusum [0,0,0,15,30,45]e6; h=1 flags the 30e6 and 45e6 steps
    val a = (1L to 3L).map(("a", _, 10L)) ++ (4L to 6L).map(("a", _, 40L))
    val got = run(a, h = 1)
    assert(got(("a", 1L)) == ((0L, false)))
    assert(got(("a", 3L)) == ((0L, false)))
    assert(got(("a", 4L)) == ((15000000L, false)))
    assert(got(("a", 5L)) == ((30000000L, true)))
    assert(got(("a", 6L)) == ((45000000L, true)))
    // steady series: cusum identically 0
    val b = (1L to 6L).map(("b", _, 20L))
    run(b, h = 1).values.foreach(v => assert(v == ((0L, false))))
  }

  test("a surge from step 1 measures surplus from zero (D_0 floor)") {
    // 40,10: mean 25, D = [15e6, 0]; without the least(0, min) floor the
    // first step would read 0 instead of 15e6
    val got = run(Seq(("a", 1L, 40L), ("a", 2L, 10L)), h = 1)
    assert(got(("a", 1L)) == ((15000000L, false)))
    assert(got(("a", 2L)) == ((0L, false)))
  }

  test("decimal drift survives cumulative totals past the int64/1e6 line") {
    // steady 4e12 per step: by step 3 the prefix sum ×10⁶ (1.2e19)
    // overflows int64 — the old long arithmetic wrapped negative here;
    // decimal(38,0) must keep the steady series at exactly 0
    val big = (1L to 6L).map(("g", _, 4_000_000_000_000L))
    run(big, h = 1).values.foreach(v => assert(v == ((0L, false))))
    // genuine shift at that magnitude stays integer-exact: 1e12 ×3 then
    // 3e12 ×3 — mean 2e12, D(micro) = [-1,-2,-3,-2,-1,0]e18 (intermediate
    // prefix-sum products up to 1.2e19 exceed int64), min floor -3e18 →
    // cusum [0,0,0,1,2,3]e18; h=1 ⇒ only step 6 (3e18 > 2e18) fires
    val shift = (1L to 3L).map(("s", _, 1_000_000_000_000L)) ++
      (4L to 6L).map(("s", _, 3_000_000_000_000L))
    val got = run(shift, h = 1)
    assert(got(("s", 4L)) == ((1_000_000_000_000_000_000L, false)))
    assert(got(("s", 5L)) == ((2_000_000_000_000_000_000L, false)))
    assert(got(("s", 6L)) == ((3_000_000_000_000_000_000L, true)))
  }

  test("groups are independent and order-of-input irrelevant") {
    val a = (1L to 3L).map(("a", _, 10L)) ++ (4L to 6L).map(("a", _, 40L))
    val b = (1L to 6L).map(("b", _, 20L))
    val mixed = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle((a ++ b).toList)
    val got = run(mixed, h = 1)
    assert(got(("a", 6L)) == ((45000000L, true)))
    assert(got(("b", 6L)) == ((0L, false)))
  }
}
