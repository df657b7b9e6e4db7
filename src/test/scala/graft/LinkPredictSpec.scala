package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkPredict

class LinkPredictSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)], minCommon: Int,
      maxViaDegree: Int): Map[(Long, Long), (Long, Long)] = {
    import spark.implicits._
    LinkPredict.commonNeighborPairs(
      edges.toDF("u", "v"), "u", "v", minCommon, maxViaDegree)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("hand graph: cn and integer resource allocation") {
    // items: 100 shared by {1,2,3} (deg 3), 200 by {1,2} (deg 2),
    //        300 by {2,3} (deg 2), 400 only by 1
    val edges = Seq[(Long, Long)](
      (1L, 100L), (2L, 100L), (3L, 100L),
      (1L, 200L), (2L, 200L),
      (2L, 300L), (3L, 300L),
      (1L, 400L))
    val got = run(edges, minCommon = 1, maxViaDegree = 100)
    // (1,2): via 100 (deg3) + 200 (deg2) → cn=2, ra = 333333 + 500000
    // (1,3): via 100 → cn=1, ra = 333333
    // (2,3): via 100 + 300 → cn=2, ra = 333333 + 500000
    assert(got == Map(
      (1L, 2L) -> ((2L, 833333L)),
      (1L, 3L) -> ((1L, 333333L)),
      (2L, 3L) -> ((2L, 833333L))))
  }

  test("degree cap removes hot via-nodes before pair generation") {
    val edges = Seq[(Long, Long)](
      (1L, 100L), (2L, 100L), (3L, 100L), // deg 3 — capped out at 2
      (1L, 200L), (2L, 200L))
    val got = run(edges, minCommon = 1, maxViaDegree = 2)
    assert(got == Map((1L, 2L) -> ((1L, 500000L))))
  }

  test("minCommon filters, duplicate edges collapse, self-overlap impossible") {
    val edges = Seq[(Long, Long)](
      (1L, 100L), (1L, 100L), (2L, 100L), // duplicate edge counts once
      (1L, 200L), (2L, 200L))
    assert(run(edges, minCommon = 3, maxViaDegree = 10).isEmpty)
    val got = run(edges, minCommon = 2, maxViaDegree = 10)
    assert(got == Map((1L, 2L) -> ((2L, 1000000L))))
  }
}
