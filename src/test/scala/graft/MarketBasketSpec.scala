package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MarketBasket

class MarketBasketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("top-k pairs and marginals match a brute-force reference on random baskets") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (1 to 120).flatMap { b =>
      // duplicate items inside a basket must count once
      (0 until 2 + rng.nextInt(5)).map(_ => (b.toLong, rng.nextInt(12).toLong))
    }
    val k = 10
    val got = MarketBasket.frequentPairs(rows.toDF("b", "i"), "b", "i", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val baskets = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemN = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairN = baskets.values.flatMap { s =>
      for (a <- s; b <- s if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairN.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(k)
      .map { case ((a, b), n) => (a, b, n, itemN(a), itemN(b)) }
    assert(got.toSeq == expect)
  }

  test("k larger than the pair universe returns everything, still ordered") {
    import spark.implicits._
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 9L))
    val got = MarketBasket.frequentPairs(rows.toDF("b", "i"), "b", "i", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 2L)))
  }
}
