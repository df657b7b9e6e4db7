package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents.connectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("id_a", "id_b")
  }

  /** Driver-side union-find reference. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) if a != b =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    case _ => ()
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    connectedComponents(pairsDf(pairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph collapses to its minimum (needs O(log n) rounds, not diameter)") {
    val chain = (1L until 40L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
  }

  test("disjoint clique, chain, and pair each get their own minimum") {
    val clique = for { a <- 100L to 104L; b <- (a + 1) to 104L } yield (a, b)
    val chain = Seq((7L, 3L), (3L, 9L), (9L, 5L))
    val pair = Seq((200L, 201L))
    val got = run(clique ++ chain ++ pair)
    assert((100L to 104L).forall(got(_) == 100L))
    assert(Seq(3L, 5L, 7L, 9L).forall(got(_) == 3L))
    assert(got(200L) == 200L && got(201L) == 200L)
  }

  test("self-pairs and duplicate edges are ignored; empty input yields empty output") {
    val got = run(Seq((4L, 4L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
    assert(connectedComponents(pairsDf(Seq.empty)).isEmpty)
  }

  test("random graphs match driver-side union-find") {
    val edgeGen = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L)
    } yield (a, b)
    val prop = Prop.forAll(Gen.listOfN(25, edgeGen)) { edges =>
      val clean = edges.filter { case (a, b) => a != b }
      clean.isEmpty || run(clean) == unionFind(clean)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
