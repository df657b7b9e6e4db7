package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangePoint

class ChangePointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Exact BigInt replay of the documented convention: grid collapse,
    * num_t = t·Sn − n·St, truncated ppm over t·(n−t), argmax |ppm| with
    * ties to the earliest grid x. */
  private def ref(rows: Seq[(Long, Long)]): Option[(Long, Long, Long)] = {
    val g = rows.groupBy(_._1).view.mapValues(_.map(p => BigInt(p._2)).sum)
      .toSeq.sortBy(_._1)
    val n = g.size
    if (n < 2) return None
    val sn = g.map(_._2).sum
    var st = BigInt(0)
    var best: Option[(Long, Long)] = None // (split_x, ppm)
    for (t <- 1 until n) {
      st += g(t - 1)._2
      val num = BigInt(t) * sn - BigInt(n) * st
      val ppm = ((if (num < 0) BigInt(-1) else BigInt(1)) *
        ((num.abs * 1000000) / (BigInt(t) * BigInt(n - t)))).toLong
      if (best.forall(b => math.abs(ppm) > math.abs(b._2)))
        best = Some((g(t - 1)._1, ppm)) // strict > keeps the earliest x on ties
    }
    best.map(b => (n.toLong, b._1, b._2))
  }

  test("a clean level shift is located exactly, with the exact mean-diff ppm") {
    import spark.implicits._
    // group A: 10 at level 100 then 10 at level 300 → split after x=9,
    // shift = +200 units = 200,000,000 ppm-of-unit… (y already integer)
    val a = (0L until 10L).map(x => ("A", x, 100L)) ++
      (10L until 20L).map(x => ("A", x, 300L))
    val got = ChangePoint.meanShiftChangePoint(
      a.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("A", 20L, 9L, 200000000L)))
  }

  test("random multi-group series match the BigInt reference, incl. duplicate-x collapse") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = for {
      g <- Seq("a", "b", "c", "single")
      i <- 0 until (if (g == "single") 1 else 40)
    } yield (g, rng.nextInt(12).toLong, (rng.nextInt(2000) - 700).toLong)
    val got = ChangePoint.meanShiftChangePoint(
      rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = rows.groupBy(_._1).view
      .mapValues(rs => ref(rs.map(r => (r._2, r._3)))).toMap
    // 'single' has one grid point → absent; others match the reference
    assert(got.keySet == want.filter(_._2.isDefined).keySet)
    want.foreach {
      case (g, Some(w)) => assert(got(g) == w, s"group $g")
      case _ =>
    }
  }

  test("ties in |ppm| resolve to the earliest grid point") {
    import spark.implicits._
    // symmetric V shape: splits after x=0 and after x=1 score the same
    // |mean diff|; the earliest x must win
    val rows = Seq(("t", 0L, 0L), ("t", 1L, 6L), ("t", 2L, 0L))
    val got = ChangePoint.meanShiftChangePoint(
      rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ref(rows.map(r => (r._2, r._3))).get
    assert(got.toSeq == Seq(want) && want._2 == 0L)
  }
}
