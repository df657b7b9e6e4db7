package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Communities

class CommunitiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // driver-side synchronous LPA with the same (count desc, label asc) ties
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = (canon.toSeq ++ canon.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(labels).groupBy(identity).view
          .mapValues(_.size).toMap
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Communities.labelPropagation(edges.toDF("a", "b"), "a", "b", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two cliques joined by one bridge edge split into two communities") {
    val cliqueA = for { a <- 0L until 5L; b <- 0L until 5L if a < b } yield (a, b)
    val cliqueB = for { a <- 10L until 15L; b <- 10L until 15L if a < b } yield (a, b)
    val edges = cliqueA ++ cliqueB :+ ((4L, 10L))
    val got = run(edges, 3)
    val commA = (0L until 5L).map(got).toSet
    val commB = (10L until 15L).map(got).toSet
    assert(commA.size == 1, s"clique A not uniform: $commA")
    assert(commB.size == 1, s"clique B not uniform: $commB")
    assert(commA != commB, "bridge edge merged the cliques")
  }

  test("synchronous rounds with deterministic ties match the reference on random graphs") {
    val rng = new scala.util.Random(31)
    (1 to 4).foreach { trial =>
      val n = 15 + trial * 5
      val edges = (1 to n * 3).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      (1 to 3).foreach { iters =>
        assert(run(edges, iters) == refLpa(edges, iters),
          s"trial $trial iters $iters")
      }
    }
  }
}
