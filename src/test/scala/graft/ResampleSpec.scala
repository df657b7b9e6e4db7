package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample
import graft.testkit.DatasetComparisons._

class ResampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("gap fill: dense grid per key, forward fill, in-bucket latest wins") {
    import spark.implicits._
    // key a: buckets 0 (two events — later one wins), 1 missing, 2 observed
    // key b: a single event → a single-bucket grid
    val df = Seq(
      ("a", 5L, 1L, 10.0), ("a", 7L, 2L, 11.0), // bucket 0, t=7 wins
      ("a", 25L, 3L, 13.0),                     // bucket 2
      ("b", 42L, 4L, 99.0))
      .toDF("k", "t", "id", "v")
    val got = Resample.resampleForwardFill(df, Seq("k"), "t", "id", "v", step = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(
      ("a", 0L, 11.0, true),
      ("a", 1L, 11.0, false), // gap: forward-filled
      ("a", 2L, 13.0, true),
      ("b", 4L, 99.0, true)))
  }

  test("ties on time break by the tiebreaker; result is partitioning-independent") {
    import spark.implicits._
    val df = Seq(("a", 5L, 1L, 1.0), ("a", 5L, 2L, 2.0)).toDF("k", "t", "id", "v")
    val got = Resample.resampleForwardFill(df, Seq("k"), "t", "id", "v", 10L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((0L, 2.0)), "greatest tiebreaker id wins")
    val big = (1L to 200L).map(i => (s"k${i % 5}", i * 3, i, i.toDouble))
      .toDF("k", "t", "id", "v")
    Resample.resampleForwardFill(big.repartition(13), Seq("k"), "t", "id", "v", 25L)
      .ensureDatasetEquals(
        Resample.resampleForwardFill(big, Seq("k"), "t", "id", "v", 25L))
  }
}
