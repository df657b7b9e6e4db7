package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Attribution

class AttributionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val W = 100L // window ns for these fixtures

  private def credits(
      convs: Seq[(Long, Long, Long, Long)], // (pid, user, ts, value_micro)
      touches: Seq[(Long, Long, Long)]) = { // (cid, user, ts)
    import spark.implicits._
    Attribution.uShapedCredits(
      convs.toDF("pid", "pu", "pts", "v"), "pid", "pu", "pts", "v",
      touches.toDF("cid", "cu", "cts"), "cid", "cu", "cts",
      windowNs = W)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
  }

  test("positions and the documented credit convention, k = 1..5") {
    // one user; touches at ts 10, 20, 30, 40, 50
    val touches = (1L to 5L).map(i => (i, 7L, i * 10L))
    // conversions capturing k=1 (window reaches only ts=10), k=2, k=3, k=5
    val convs = Seq(
      (101L, 7L, 15L, 1000001L), // touches {10} → k=1
      (102L, 7L, 25L, 1000001L), // {10,20} → k=2
      (103L, 7L, 35L, 1000001L), // {10,20,30} → k=3
      (105L, 7L, 55L, 999999L)) // all five → k=5
    val got = credits(convs, touches).groupBy(_._1)

    // k=1: the only touch takes everything
    assert(got(101L).toSet == Set((101L, 1L, 1L, "only", 1000001L)))
    // k=2: v div 2 / v − v div 2 (the odd micro-unit goes to the last)
    assert(got(102L).toSet == Set(
      (102L, 1L, 2L, "first", 500000L), (102L, 2L, 2L, "last", 500001L)))
    // k=3: first 40%, middle (v−first−lastNom) div 1, last absorbs remainder
    val first3 = 1000001L * 4000 / 10000 // 400000 (exact div)
    val mid3 = 1000001L - first3 - first3 // lastNom == first here
    assert(got(103L).toSet == Set(
      (103L, 1L, 3L, "first", first3),
      (103L, 2L, 3L, "middle", mid3),
      (103L, 3L, 3L, "last", 1000001L - first3 - mid3)))
    // k=5: three middles split (v − first − lastNom) div 3; last absorbs
    val v5 = 999999L
    val f5 = v5 * 4000 / 10000
    val m5 = (v5 - 2 * f5) / 3
    val l5 = v5 - f5 - 3 * m5
    assert(got(105L).toSet == Set(
      (105L, 1L, 5L, "first", f5), (105L, 2L, 5L, "middle", m5),
      (105L, 3L, 5L, "middle", m5), (105L, 4L, 5L, "middle", m5),
      (105L, 5L, 5L, "last", l5)))
  }

  test("value conservation: every conversion's credits sum to exactly its value") {
    val rng = new scala.util.Random(17)
    val touches = (1 to 300).map(i =>
      (i.toLong, rng.nextInt(10).toLong, rng.nextInt(1000).toLong))
    val convs = (1 to 80).map(i =>
      (1000L + i, rng.nextInt(10).toLong, rng.nextInt(1000).toLong,
        rng.nextInt(1000000).toLong))
    val byConv = credits(convs, touches).groupBy(_._1)
    val values = convs.map(c => c._1 -> c._4).toMap
    assert(byConv.nonEmpty)
    byConv.foreach { case (pid, rows) =>
      assert(rows.map(_._5).sum == values(pid), s"conversion $pid")
      // exactly one first+last (or one only) regardless of k
      val k = rows.head._3
      val pos = rows.map(_._4)
      if (k == 1) assert(pos.toSeq == Seq("only"))
      else {
        assert(pos.count(_ == "first") == 1 && pos.count(_ == "last") == 1)
        assert(pos.count(_ == "middle") == k - 2)
      }
    }
  }

  test("window boundaries are (ts−W, ts]: a touch exactly W old is out, at ts is in") {
    val touches = Seq((1L, 5L, 100L), (2L, 5L, 200L))
    // conv at ts=200: touch@100 is exactly W=100 old → excluded; touch@200 in
    val got = credits(Seq((9L, 5L, 200L, 50L)), touches)
    assert(got.toSet == Set((9L, 2L, 1L, "only", 50L)))
    // conv with no touch in window is absent entirely
    assert(credits(Seq((9L, 5L, 1000L, 50L)), touches).isEmpty)
  }

  test("negative conversion value fails loudly (credit math assumes non-negative)") {
    intercept[Exception] {
      credits(Seq((9L, 5L, 50L, -1L)), Seq((1L, 5L, 40L)))
    }
  }

  private def decay(
      convs: Seq[(Long, Long, Long, Long)],
      touches: Seq[(Long, Long, Long)],
      windowNs: Long, halfLifeNs: Long) = {
    import spark.implicits._
    Attribution.timeDecayCredits(
      convs.toDF("pid", "pu", "pts", "v"), "pid", "pu", "pts", "v",
      touches.toDF("cid", "cu", "cts"), "cid", "cu", "cts",
      windowNs, halfLifeNs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
  }

  test("timeDecayCredits: hand-checked halving weights, remainder to most recent") {
    // window 40, half-life 10 → maxAge 4, weights 2^(4−age).
    // conv at ts=100, v=1000; touches at ts 100 (age 0, w 16) and 90
    // (age 1, w 8): W = 24 → floors 666 and 333; most recent (+1) → 667
    val got = decay(Seq((9L, 5L, 100L, 1000L)),
      Seq((1L, 5L, 100L), (2L, 5L, 90L)), windowNs = 40L, halfLifeNs = 10L)
    assert(got.toSet == Set(
      (9L, 1L, 2L, 0L, 16L, 667L),
      (9L, 2L, 2L, 1L, 8L, 333L)))
  }

  test("timeDecayCredits: value conservation under arbitrary touch layouts") {
    val rng = new scala.util.Random(7)
    val touches = (1L to 40L).map(i => (i, i % 3, rng.nextInt(200).toLong))
    val convs = (101L to 110L).map(i =>
      (i, i % 3, 100L + rng.nextInt(150), 1L + rng.nextInt(100000).toLong))
    val rows = decay(convs, touches, windowNs = 70L, halfLifeNs = 7L)
    val byConv = rows.groupBy(_._1).view.mapValues(_.map(_._6).sum).toMap
    val values = convs.map(c => c._1 -> c._4).toMap
    byConv.foreach { case (pid, total) =>
      assert(total == values(pid), s"conversion $pid leaked credit")
    }
  }

  test("timeDecayCredits: remainder tie at equal ts goes to the larger touch id") {
    // both touches at age 0, equal weights 2 → floors v div 2 each;
    // v odd → the id-2 touch absorbs the extra micro-unit
    val got = decay(Seq((9L, 5L, 100L, 101L)),
      Seq((1L, 5L, 100L), (2L, 5L, 100L)), windowNs = 20L, halfLifeNs = 10L)
    assert(got.toSet == Set(
      (9L, 1L, 2L, 0L, 4L, 50L),
      (9L, 2L, 2L, 0L, 4L, 51L)))
  }

  test("timeDecayCredits: an over-62-half-life window fails loudly") {
    intercept[IllegalArgumentException] {
      decay(Seq((9L, 5L, 100L, 10L)), Seq((1L, 5L, 90L)),
        windowNs = 6300L, halfLifeNs = 100L)
    }
  }
}
