package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

class LabelSpreadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na * nb == 0) 0.0 else dot / (na * nb)
  }

  test("majority vote of the k nearest seeds matches a brute-force reference") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    def vec(label: Int): Seq[Float] = {
      // clusters along axis `label` with noise, so votes are non-trivial
      val v = Array.fill(6)(rng.nextFloat() * 0.6f)
      v(label) += 2.0f
      v.toSeq
    }
    val seeds = (0 until 40).map(i => (i.toLong, vec(i % 3), i % 3))
    val unlabeled = (100 until 160).map(i => (i.toLong, vec(i % 3), -1))

    val got = Similarity.labelSpread(
      unlabeled.toDF("vec_id", "embedding", "label"), "vec_id", "embedding",
      seeds.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label",
      k = 7)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap

    unlabeled.foreach { case (uid, uv, _) =>
      val top = seeds.map { case (sid, sv, lab) => (cos(uv, sv), sid, lab) }
        .sortBy { case (c, sid, _) => (-c, sid) }
        .take(7)
      val votes = top.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val (winLabel, winVotes) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(got(uid) == ((winLabel, winVotes)), s"vec $uid")
      // the clusters are separable enough that the vote recovers the truth
      assert(winLabel == (uid % 3).toInt, s"vec $uid should vote its own cluster")
    }
  }

  test("a seed id colliding with an unlabeled id never votes for itself") {
    import spark.implicits._
    // identical vectors, shared id 1: the self-pair must be excluded, so
    // vec 1 is labeled by seed 2 (the only OTHER seed)
    val seeds = Seq((1L, Seq(1f, 0f), 5), (2L, Seq(0f, 1f), 9))
    val unlabeled = Seq((1L, Seq(1f, 0f), -1))
    val got = Similarity.labelSpread(
      unlabeled.toDF("vec_id", "embedding", "label"), "vec_id", "embedding",
      seeds.toDF("vec_id", "embedding", "label"), "vec_id", "embedding", "label",
      k = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 9, 1L)))
  }
}
