package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore.kCore

class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    kCore(edges.toDF("a", "b").repartition(5), "a", "b", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("3-core of K4 plus a pendant tail is exactly the K4") {
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val tail = Seq(4L -> 5L, 5L -> 6L)
    assert(run(k4 ++ tail, k = 3) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("peeling cascades: a tail dies one node per round") {
    // triangle + path 3-4-5: node 5 falls in round 1, which drops 4's
    // degree below 2 so it falls in round 2 — order-independent peeling
    val g = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(run(g, k = 2, rounds = 3) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round is NOT enough for the cascade — the bound is honest
    assert(run(g, k = 2, rounds = 1).keySet == Set(1L, 2L, 3L, 4L))
  }

  test("duplicates, self-loops, and orientation don't change the core") {
    val g = Seq(1L -> 2L, 2L -> 1L, 1L -> 1L, 2L -> 3L, 1L -> 3L, 3L -> 3L)
    val want = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(run(g, k = 2) == want)
    assert(run(g.map(_.swap), k = 2) == want)
  }

  test("threshold above the max degree empties the graph") {
    assert(run(Seq(1L -> 2L, 2L -> 3L), k = 5).isEmpty)
  }
}
