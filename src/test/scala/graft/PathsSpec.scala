package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Paths

class PathsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("census matches a per-window sorted-fold reference on random streams") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val states = Vector("view", "click", "cart", "buy")
    // colliding ts values exercise the tie column
    val rows = (1 to 500).map { i =>
      (rng.nextInt(25).toLong, rng.nextInt(3).toLong,
        rng.nextInt(30).toLong, i.toLong, states(rng.nextInt(states.size)))
    } // (user, window, ts, tie, state)
    val got = Paths.pathCensus(
      rows.toDF("u", "w", "ts", "tie", "st"),
      "u", col("w"), "st", "ts", "tie")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val journeys = rows.groupBy(r => (r._1, r._2)).toSeq.map { case ((u, _), evs) =>
      (u, evs.sortBy(e => (e._3, e._4)).map(_._5).mkString(">"))
    }
    val want = journeys.groupBy(_._2).view.mapValues(js =>
      (js.size.toLong, js.map(_._1).distinct.size.toLong)).toMap
    assert(got == want)
  }

  test("a state containing the separator fails loudly instead of aliasing journeys") {
    import spark.implicits._
    val rows = Seq((1L, 1L, 1L, 1L, "a>b"))
    intercept[Exception] {
      Paths.pathCensus(rows.toDF("u", "w", "ts", "tie", "st"),
        "u", col("w"), "st", "ts", "tie").collect()
    }
  }

  test("single-event windows are length-1 paths; distinct entities counted once") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 1L, 1L, "a"), (1L, 2L, 1L, 2L, "a"), // same user, two windows
      (2L, 1L, 1L, 3L, "a"),
      (3L, 1L, 1L, 4L, "b"), (3L, 1L, 2L, 5L, "c"))
    val got = Paths.pathCensus(rows.toDF("u", "w", "ts", "tie", "st"),
      "u", col("w"), "st", "ts", "tie")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 3L, 2L), ("b>c", 1L, 1L)))
  }
}
