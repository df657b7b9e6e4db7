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

  test("modularity: hand-computed Q of two triangles joined by a bridge") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3-4: m = 7 edges; with the
    // perfect partition each community has e_in = 3, deg_sum = 7, so its
    // contribution is (4·7·3 − 49)·10⁶ div (4·49) = 35e6 div 196 = 178571
    // (Q = 5/14 ≈ 0.357143 total — lower-middle truncation, not rounding)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val comm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    val got = Communities.modularity(edges, "a", "b", comm)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(1L -> ((3L, 7L, 3L, 178571L)),
      4L -> ((3L, 7L, 3L, 178571L))))
  }

  test("modularity: the everything-in-one-community partition scores zero") {
    import spark.implicits._
    // one community holding the whole graph: e_in = m and deg_sum = 2m,
    // so 4m·m − (2m)² = 0 exactly — the classic Q identity, sign-split
    // div included (num = 0 must not emit -0-style artifacts)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val comm = (1L to 4L).map(i => (i, 1L)).toDF("id", "community")
    val got = Communities.modularity(edges, "a", "b", comm).head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      == ((4L, 8L, 4L, 0L)))
  }
}
