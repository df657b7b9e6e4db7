package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2
import graft.testkit.DatasetComparisons._

class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def hist(rows: Seq[(Long, String, Long, Option[Long], Boolean)]) = {
    import spark.implicits._
    rows.toDF("k", "attr", "valid_from", "valid_to", "is_current")
      .withColumn("valid_to", col("valid_to").cast("long"))
  }

  test("all four transitions: unchanged, changed, deleted, new; past untouched") {
    import spark.implicits._
    val history = hist(Seq(
      (1L, "same", 1L, None, true),          // unchanged
      (2L, "old", 1L, None, true),           // changed at v2
      (3L, "gone", 1L, None, true),          // deleted at v2
      (2L, "older", 0L, Some(1L), false)))   // historical — must pass through
    val snapshot = Seq((1L, "same"), (2L, "new"), (4L, "born"))
      .toDF("k", "attr")
    val got = Scd2.mergeSnapshot(history, snapshot, Seq("k"), Seq("attr"), 2L)
    val want = hist(Seq(
      (2L, "older", 0L, Some(1L), false),
      (1L, "same", 1L, None, true),
      (2L, "old", 1L, Some(2L), false),
      (2L, "new", 2L, None, true),
      (3L, "gone", 1L, Some(2L), false),
      (4L, "born", 2L, None, true)))
    got.ensureDatasetEquals(want)
    // invariant: exactly one current row per live key, none for deleted
    val curCounts = got.filter(col("is_current"))
      .groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(curCounts == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("idempotence: folding the identical snapshot again changes nothing") {
    import spark.implicits._
    val history = hist(Seq((1L, "a", 1L, None, true), (2L, "b", 1L, None, true)))
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
    val once = Scd2.mergeSnapshot(history, snap, Seq("k"), Seq("attr"), 2L)
    val twice = Scd2.mergeSnapshot(once, snap, Seq("k"), Seq("attr"), 3L)
    once.ensureDatasetEquals(twice)
  }

  test("multi-attr fingerprint: any attr flip reopens; attr order fixed") {
    import spark.implicits._
    val history = Seq((1L, "x", 10L, 1L, null.asInstanceOf[java.lang.Long], true))
      .toDF("k", "a1", "a2", "valid_from", "valid_to", "is_current")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val snap = Seq((1L, "x", 11L)).toDF("k", "a1", "a2")
    val got = Scd2.mergeSnapshot(history, snap, Seq("k"), Seq("a1", "a2"), 2L)
    val cur = got.filter(col("is_current")).collect()
    assert(cur.length == 1 && cur.head.getLong(2) == 11L)
    val closed = got.filter(!col("is_current")).collect()
    assert(closed.length == 1 && closed.head.getLong(3) == 1L &&
      closed.head.getLong(4) == 2L)
  }

  test("fingerprint disambiguates boundary shifts, NULL vs empty, embedded bytes") {
    import spark.implicits._
    // ("ab","c") → ("a","bc"): same concatenation, different tuple — the
    // length-prefixed fingerprint must classify it as CHANGED
    val h1 = Seq((1L, "ab", "c", 1L, null.asInstanceOf[java.lang.Long], true))
      .toDF("k", "a1", "a2", "valid_from", "valid_to", "is_current")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val s1 = Seq((1L, "a", "bc")).toDF("k", "a1", "a2")
    val g1 = Scd2.mergeSnapshot(h1, s1, Seq("k"), Seq("a1", "a2"), 2L)
    assert(g1.filter(col("is_current") && col("a1") === "a").count() == 1L)
    assert(g1.filter(!col("is_current")).count() == 1L)
    // NULL → empty string is a real change
    val h2 = Seq((1L, null.asInstanceOf[String], 1L, null.asInstanceOf[java.lang.Long], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
      .withColumn("valid_to", col("valid_to").cast("long"))
    val s2 = Seq((1L, "")).toDF("k", "attr")
    val g2 = Scd2.mergeSnapshot(h2, s2, Seq("k"), Seq("attr"), 2L)
    assert(g2.filter(!col("is_current")).count() == 1L)
    assert(g2.filter(col("is_current") && col("attr") === "").count() == 1L)
    // a value embedding the digits+colon prefix pattern still round-trips
    // as UNCHANGED when genuinely identical
    val h3 = hist(Seq((1L, "2:ab", 1L, None, true)))
    val s3 = Seq((1L, "2:ab")).toDF("k", "attr")
    val g3 = Scd2.mergeSnapshot(h3, s3, Seq("k"), Seq("attr"), 2L)
    g3.ensureDatasetEquals(h3)
  }

  test("plan: one full-outer key join; non-current history bypasses it") {
    import spark.implicits._
    val history = hist(Seq((1L, "a", 1L, None, true), (2L, "b", 0L, Some(1L), false)))
    val snap = Seq((1L, "a")).toDF("k", "attr")
    val p = Scd2.mergeSnapshot(history, snap, Seq("k"), Seq("attr"), 2L)
      .queryExecution.executedPlan.toString
    assert("FullOuter".r.findAllIn(p).size == 1,
      s"expected exactly one full-outer join:\n$p")
    assert(!p.contains("Window"), s"scd2 must not use windows:\n$p")
  }
}
