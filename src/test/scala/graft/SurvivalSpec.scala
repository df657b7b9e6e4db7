package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Survival

class SurvivalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("risk table matches a brute-force count on random censored durations") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val subj = (1 to 300).map(_ => (rng.nextInt(12).toLong, rng.nextInt(2).toLong))
    val got = Survival.kmRiskTable(subj.toDF("t", "ev"), "t", "ev")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ts = subj.map(_._1).distinct
    assert(got.keySet == ts.toSet)
    ts.foreach { t =>
      val nRisk = subj.count(_._1 >= t).toLong
      val d = subj.count(s => s._1 == t && s._2 == 1L).toLong
      val c = subj.count(s => s._1 == t && s._2 == 0L).toLong
      assert(got(t) == ((nRisk, d, c)), s"t=$t")
    }
    // n_risk telescopes: entering risk at the smallest t = every subject
    assert(got(ts.min)._1 == subj.size.toLong)
  }

  test("an event flag outside {0,1} fails loudly instead of corrupting counts") {
    import spark.implicits._
    intercept[Exception] {
      Survival.kmRiskTable(Seq((1L, 2L)).toDF("t", "ev"), "t", "ev").collect()
    }
    intercept[Exception] {
      Survival.kmRiskTable(
        Seq((Some(1L), None: Option[Long])).toDF("t", "ev"), "t", "ev").collect()
    }
  }
}
