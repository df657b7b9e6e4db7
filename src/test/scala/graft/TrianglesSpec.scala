package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Triangles

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def refCount(edges: Seq[(Long, Long)]): (Long, Long) = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val tris = for {
      (a, b) <- canon.toSeq
      (b2, c) <- canon if b2 == b && canon((a, c))
    } yield (a, b, c)
    (canon.size.toLong, tris.size.toLong)
  }

  private def run(edges: Seq[(Long, Long)]): (Long, Long) = {
    import spark.implicits._
    val row = Triangles.triangleCount(edges.toDF("a", "b"), "a", "b")
      .collect().head
    (row.getLong(0), row.getLong(1))
  }

  test("random graphs match brute-force enumeration") {
    val rng = new scala.util.Random(5)
    (1 to 5).foreach { trial =>
      val n = 12 + trial * 3
      val edges = (1 to n * 4).map(_ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      assert(run(edges) == refCount(edges), s"trial $trial")
    }
  }

  test("K5 has C(5,3)=10 triangles; a star hub has none; dup/self edges tolerated") {
    val k5 = for { a <- 0L until 5L; b <- 0L until 5L if a < b } yield (a, b)
    assert(run(k5) == ((10L, 10L)))
    // hub 0 with 30 leaves: the skew shape degree-ordering exists for
    val star = (1L to 30L).map(l => (0L, l))
    assert(run(star) == ((30L, 0L)))
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(run(messy) == ((3L, 1L)))
  }

  private def coeffs(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    graft.operators.Triangles.clusteringCoefficients(
      edges.toDF("x", "y"), "x", "y")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
  }

  test("clusteringCoefficients: triangle + pendant, hand-checked ppm") {
    // triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, 1 triangle →
    // 2·1e6/(3·2) = 333333; nodes 1,2 deg 2 → 1e6; node 4 deg 1 → NULL
    val got = coeffs(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got == Map(
      1L -> ((2L, 1L, Some(1000000L))),
      2L -> ((2L, 1L, Some(1000000L))),
      3L -> ((3L, 1L, Some(333333L))),
      4L -> ((1L, 0L, None))))
  }

  test("clusteringCoefficients: K4 is all-1e6; star center is 0") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(coeffs(k4).values.forall(_ == ((3L, 3L, Some(1000000L)))))
    val star = (2L to 5L).map(i => (1L, i))
    val got = coeffs(star)
    assert(got(1L) == ((4L, 0L, Some(0L))))
    (2L to 5L).foreach(i => assert(got(i) == ((1L, 0L, None))))
  }
}
