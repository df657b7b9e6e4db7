package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

class FairCapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def alloc(groups: Map[String, Int], budget: Long)
      : Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    val rows = groups.toSeq.flatMap { case (g, n) => Seq.fill(n)(g) }
    Sampling.fairCaps(rows.toDF("src"), "src", budget)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("skewed groups: cap lands mid-segment, remainder dealt by key order") {
    // [a:1, b:10, c:100], B=12 → c* = 5 (1 + 2·5 = 11 ≤ 12 < 1 + 2·6);
    // remainder 1 goes to the first capped group by key (b)
    val got = alloc(Map("a" -> 1, "b" -> 10, "c" -> 100), 12L)
    assert(got("a") == ((1L, 5L, 1L)))
    assert(got("b") == ((10L, 5L, 6L)))
    assert(got("c") == ((100L, 5L, 5L)))
    assert(got.values.map(_._3).sum == 12L)
  }

  test("budget covers everything: every group keeps its count") {
    val got = alloc(Map("a" -> 3, "b" -> 4), 100L)
    assert(got("a") == ((3L, 4L, 3L)))
    assert(got("b") == ((4L, 4L, 4L)))
  }

  test("equal groups with remainder; zero budget") {
    // [5,5,5], B=7 → c* = 2 (3·2 = 6 ≤ 7 < 9), remainder 1 → first key
    val got = alloc(Map("x" -> 5, "y" -> 5, "z" -> 5), 7L)
    assert(got("x") == ((5L, 2L, 3L)))
    assert(got("y") == ((5L, 2L, 2L)))
    assert(got("z") == ((5L, 2L, 2L)))
    val zero = alloc(Map("x" -> 5, "y" -> 5), 0L)
    assert(zero.values.forall(_._3 == 0L))
  }

  test("tiny budget below group count: cap 0, remainder-only allocation") {
    // [5,5], B=1 → c* = 0, remainder 1 → first key gets the single row
    val got = alloc(Map("p" -> 5, "q" -> 5), 1L)
    assert(got("p") == ((5L, 0L, 1L)))
    assert(got("q") == ((5L, 0L, 0L)))
  }

  test("sum of allocations is exactly min(budget, total), many random cases") {
    val rnd = new scala.util.Random(31)
    for (t <- 1 to 8) {
      val groups = (1 to (2 + rnd.nextInt(6)))
        .map(i => s"g$i" -> (1 + rnd.nextInt(40))).toMap
      val total = groups.values.map(_.toLong).sum
      val budget = rnd.nextInt(80).toLong
      val got = alloc(groups, budget)
      assert(got.values.map(_._3).sum == math.min(budget, total),
        s"case $t: groups=$groups budget=$budget got=$got")
      // no group exceeds its count; capped groups within cap+1
      got.foreach { case (g, (n, cap, a)) =>
        assert(a <= n && a <= cap + 1, s"case $t: $g n=$n cap=$cap a=$a")
      }
    }
  }
}
