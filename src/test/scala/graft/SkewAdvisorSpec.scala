package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.skew.SkewAdvisor

class SkewAdvisorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hot-key report matches exact integer arithmetic on a skewed key set") {
    import spark.implicits._
    // key 1: 700 rows (hot), key 2: 250, keys 3..52: 1 each → total 1000
    val rows = Seq.fill(700)(1L) ++ Seq.fill(250)(2L) ++ (3L to 52L)
    val got = SkewAdvisor.advise(rows.toDF("k"), Seq("k"),
      topK = 3, numPartitions = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ideal = ceil(1000/10) = 100
    assert(got.toSeq == Seq(
      (1L, 700L, 700000L, 100L, 7L),
      (2L, 250L, 250000L, 100L, 3L),
      (3L, 1L, 1000L, 100L, 1L))) // topK tie → smallest key
  }

  test("a level key distribution recommends no salting") {
    import spark.implicits._
    val rows = (1L to 64L).flatMap(k => Seq.fill(4)(k))
    val got = SkewAdvisor.advise(rows.toDF("k"), Seq("k"),
      topK = 64, numPartitions = 8)
      .collect().map(r => r.getLong(4)).toSet
    assert(got == Set(1L), "every recommended_salts must be 1 on level data")
  }
}
