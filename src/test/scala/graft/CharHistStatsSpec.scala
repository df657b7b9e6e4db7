package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CharHistStats

class CharHistStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(texts: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    texts.toDF("id", "txt")
      .select(col("id"), CharHistStats.charHistStats(col("txt")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  test("hand cases: empty, single, repeats, surrogate pairs") {
    val got = run(Seq(
      1L -> "",          // nothing
      2L -> "a",         // one singleton
      3L -> "aabbb",     // a:2 b:3 → coll = 2·1 + 3·2 = 8
      4L -> "😀😀a", // 😀😀a: surrogate pair counts ONCE
      5L -> "abcde"))    // all distinct
    assert(got(1L) == Seq(0L, 0L, 0L))
    assert(got(2L) == Seq(1L, 1L, 0L))
    assert(got(3L) == Seq(5L, 2L, 8L))
    assert(got(4L) == Seq(3L, 2L, 2L))
    assert(got(5L) == Seq(5L, 5L, 0L))
  }

  test("matches the explode-based histogram on random mixed strings") {
    val rnd = new scala.util.Random(23)
    val alpha = "abc XYZ09é文😀"
    // build from code points so surrogate pairs never split
    val cps = alpha.codePoints().toArray
    val docs = (1 to 200).map { i =>
      val arr = Array.fill(rnd.nextInt(60))(cps(rnd.nextInt(cps.length)))
      i.toLong -> new String(arr, 0, arr.length)
    }
    val got = run(docs)
    docs.foreach { case (id, s) =>
      val counts = s.codePoints().toArray.groupBy(identity).map(_._2.length.toLong)
      val want = Seq(counts.sum, counts.size.toLong,
        counts.map(c => c * (c - 1)).sum)
      assert(got(id) == want, s"diverges for id=$id text=$s")
    }
  }

  test("interpreted eval equals codegen") {
    import spark.implicits._
    val df = Seq((1L, "abracadabra")).toDF("id", "txt")
    def go() = df.select(CharHistStats.charHistStats(col("txt")).as("h"))
      .collect().head.getSeq[Long](0)
    val on = go()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(go() == on)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(on == Seq(11L, 5L, 24L)) // a:5 b:2 r:2 c:1 d:1 → 20 + 2 + 2
  }
}
