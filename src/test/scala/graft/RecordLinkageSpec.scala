package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RecordLinkage

class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("multi-block candidates union and dedup; null block keys never match") {
    import spark.implicits._
    val left = Seq(
      (1L, "alice", "02139"), (2L, "bob", null.asInstanceOf[String]),
      (3L, "carla", "94110")).toDF("id", "name", "zip")
    val right = Seq(
      (10L, "alicia", "02139"), (11L, "robert", null.asInstanceOf[String]),
      (12L, "carla", "00000")).toDF("id", "name", "zip")
    val cand = RecordLinkage.candidates(left, "id", right, "id",
      Seq((col("zip"), col("zip")),
        (substring(col("name"), 1, 3), substring(col("name"), 1, 3))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // zip block: 1-10; name-prefix block: 1-10 (ali) and 3-12 (car);
    // null zips (2, 11) must NOT cross-match
    assert(cand == Set((1L, 10L), (3L, 12L)))
  }

  test("linkBest keeps the min-distance match with deterministic ties") {
    import spark.implicits._
    val left = Seq((1L, "smith", "b1"), (2L, "jones", "b2")).toDF("id", "name", "blk")
    val right = Seq(
      (20L, "smyth", "b1"), (21L, "smith", "b1"), (22L, "smithe", "b1"),
      (23L, "stone", "b2"), (24L, "jonas", "b2"), (25L, "janes", "b2"))
      .toDF("id", "name", "blk")
    val got = RecordLinkage.linkBest(
      left, "id", "name", right, "id", "name",
      Seq((col("blk"), col("blk"))), maxDistance = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 1 → exact match 21 (distance 0); 2 → tie at distance 1 between 24
    // and 25 → smaller id wins
    assert(got == Set((1L, 21L, 0), (2L, 24L, 1)))
  }
}
