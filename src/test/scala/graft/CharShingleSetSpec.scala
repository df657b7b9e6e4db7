package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CharShingleSet
import graft.llm.Dedup

class CharShingleSetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def hofForm(c: org.apache.spark.sql.Column, k: Int) =
    array_sort(Dedup.charShingles(c, k))

  test("bit-identical to array_sort(charShingles) on varied inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (1 to 300).map { i =>
      i.toLong -> rnd.alphanumeric.take(rnd.nextInt(40)).mkString(" ").toLowerCase
    } ++ Seq(
      1000L -> "",                       // empty → one empty shingle
      1001L -> "abc",                    // shorter than k → whole text
      1002L -> "aaaaaaaaaa",             // heavy duplicates → one shingle
      1003L -> "ünïcødé ✓ mixed 文字 text over k chars") // multi-byte code points
    val df = docs.toDF("id", "txt")
    val got = df.select(col("id"),
      CharShingleSet.charShingleSet(col("txt"), 5).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val want = df.select(col("id"), hofForm(col("txt"), 5).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got.foreach { case (id, sh) =>
      assert(sh == want(id), s"shingle set diverges for id=$id")
    }
    assert(got(1000L) == Seq(""))
    assert(got(1001L) == Seq("abc"))
    assert(got(1002L) == Seq("aaaaa"))
  }

  test("interpreted eval equals codegen") {
    import spark.implicits._
    val df = Seq((1L, "hello shingle world")).toDF("id", "txt")
    def run() = df.select(CharShingleSet.charShingleSet(col("txt"), 5).as("sh"))
      .collect().head.getSeq[String](0)
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == on)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
