package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Driver-side reference with the SAME fixed-point integer arithmetic. */
  private def reference(
      edges: Seq[(String, String)], iters: Int,
      scale: Long = 1000000000L): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    var r = nodes.map(_ -> scale / n).toMap
    (1 to iters).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => in(d) += r(s) / outdeg(s) }
      r = nodes.map(v => v -> ((15 * scale) / (100 * n) + (85 * in(v)) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    import spark.implicits._
    PageRank.pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("pageRankInt equals the integer reference on a hub graph with a dangling node") {
    // a -> b, a -> c, b -> a, c -> a, b -> d (d dangling: no out-edges)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("b", "d"))
    (1 to 4).foreach { iters =>
      val got = run(edges, iters)
      val want = reference(edges, iters)
      assert(got == want, s"iters=$iters:\ngot  $got\nwant $want")
    }
    // the hub accumulates rank above the uniform start; dangling stays low
    val r4 = run(edges, 4)
    assert(r4("a") > r4("d"), s"hub not ranked above dangling: $r4")
  }

  test("pageRankInt equals the integer reference on random graphs") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val n = 6 + rnd.nextInt(8)
      val edges = (0 until 3 * n).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.distinct.filter { case (a, b) => a != b }
      val got = run(edges, 3)
      val want = reference(edges, 3)
      assert(got == want, s"trial=$trial:\ngot  $got\nwant $want")
    }
  }
}
