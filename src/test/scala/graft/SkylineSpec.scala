package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("paretoFrontier2D: dominance semantics, both-axes ties survive, nulls drop") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1L), Some(5L)), // dominated by (2,5): equal y, strictly worse x
      (2L, Some(2L), Some(5L)), // frontier
      (3L, Some(2L), Some(5L)), // exact tie with 2 on BOTH axes — survives too
      (4L, Some(3L), Some(3L)), // frontier (trades y for x vs 2)
      (5L, Some(3L), Some(2L)), // dominated by (3,3): equal x, worse y
      (6L, Some(4L), Some(1L)), // frontier
      (7L, None, Some(9L)),     // null axis → dropped
      (8L, Some(9L), None)      // null axis → dropped
    ).toDF("id", "x", "y")
    val got = Skyline.paretoFrontier2D(df, col("x"), col("y"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L, 6L))
  }

  test("paretoFrontier2D equals the brute-force dominance filter on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // small value domain on purpose: forces heavy ties on both axes
    val pts = (1L to 300L).map(i => (i, rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.paretoFrontier2D(df, col("x"), col("y"))
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.map(_._1).toSet
    assert(got == want)
  }

  test("paretoFrontier2D plans the grid collapse, not a dominance self-join") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, i % 7, i % 5)).toDF("id", "x", "y")
    val plan = Skyline.paretoFrontier2D(df, col("x"), col("y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "skyline fell back to all-pairs")
    // the one window runs on the grid; the corpus join is broadcast semi
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
