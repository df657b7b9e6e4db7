package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Intervals

class IntervalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // reference sweep per key
  private def refSpans(rows: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long)] = {
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._4))
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      sorted.foreach { case (_, s, e, _) =>
        spans.lastOption match {
          case Some((ss, se, n)) if s <= se =>
            spans(spans.size - 1) = (ss, math.max(se, e), n + 1)
          case _ => spans += ((s, e, 1L))
        }
      }
      spans.map { case (s, e, n) => (k, s, e, n) }
    }.toSet
  }

  private def run(rows: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Intervals.coalesceIntervals(rows.toDF("k", "s", "e", "tie"),
      Seq("k"), "s", "e", "tie")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("random interval sets match the reference sweep per key") {
    val rng = new scala.util.Random(37)
    val rows = (1 to 300).map { i =>
      val s = rng.nextInt(1000).toLong
      (rng.nextInt(8).toLong, s, s + 1 + rng.nextInt(50), i.toLong)
    }
    assert(run(rows) == refSpans(rows))
  }

  test("touching intervals merge; nested intervals don't extend the span") {
    val rows = Seq(
      (1L, 0L, 10L, 1L), (1L, 10L, 20L, 2L),  // touching → one span
      (1L, 12L, 15L, 3L),                     // nested
      (1L, 30L, 40L, 4L),                     // gap → new span
      (2L, 5L, 6L, 5L))
    assert(run(rows) == Set(
      (1L, 0L, 20L, 3L), (1L, 30L, 40L, 1L), (2L, 5L, 6L, 1L)))
  }

  test("an interval swallowed by a LATER-sorted longer one still merges (running max, not lag)") {
    // [0,100) then [1,2): lag(end) would see 2 at the third row and split;
    // the running MAX must keep the span open
    val rows = Seq((1L, 0L, 100L, 1L), (1L, 1L, 2L, 2L), (1L, 50L, 60L, 3L))
    assert(run(rows) == Set((1L, 0L, 100L, 3L)))
  }
}
