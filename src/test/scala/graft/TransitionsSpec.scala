package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Transitions

class TransitionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("transition counts match a per-entity sliding reference on random streams") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val states = Vector("view", "click", "cart", "buy")
    val rows = (1 to 400).map { i =>
      (rng.nextInt(20).toLong, states(rng.nextInt(states.size)),
        rng.nextInt(50).toLong, i.toLong)
    } // (user, state, ts, tie) — colliding ts exercises the tiebreaker
    val got = Transitions
      .transitionCounts(rows.toDF("u", "st", "ts", "tie"), "u", "st", "ts", "tie")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

    val pairs = rows.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(e => (e._3, e._4)).map(e => e._2).sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.toSeq
    val ref = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val refFrom = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (k, n) =>
      assert(got(k) == ((n, refFrom(k._1))), s"transition $k")
    }
  }

  test("single-event entities produce no transitions; n_from sums the row counts") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "a", 3L, 3L),
      (2L, "z", 1L, 4L)) // user 2: one event, no transition
    val got = Transitions
      .transitionCounts(rows.toDF("u", "st", "ts", "tie"), "u", "st", "ts", "tie")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("a", "b", 1L, 1L), ("b", "a", 1L, 1L)))
  }
}
