package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

class RecallAtKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("per-query hit counts, zero-hit queries kept, integer ppm") {
    import spark.implicits._
    val exact = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3)
    ).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // 3/3
      (2L, 20L, 1), (2L, 99L, 2), (2L, 98L, 3)  // 1/3; query 3 absent → 0/3
    ).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.recallAtK(approx, exact, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((3L, 1000000L)),
      2L -> ((1L, 333333L)),
      3L -> ((0L, 0L))))
  }
}
