package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MultiContains.multiContains

class MultiContainsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def scan(texts: Seq[String], pats: Seq[String]): Seq[Seq[Int]] = {
    import spark.implicits._
    texts.toDF("t").select(multiContains(col("t"), pats).as("m"))
      .collect().map(_.getSeq[Int](0).toList).toList
  }

  test("overlapping, nested, and suffix patterns all fire from one pass") {
    // "abc" contains ab, b, bc, abc — including matches that END inside
    // other matches (the fail/exit-link path, not just goto)
    val got = scan(Seq("abc", "xbx", "zzz", ""),
      Seq("ab", "b", "bc", "abc"))
    assert(got == Seq(Seq(0, 1, 2, 3), Seq(1), Seq(), Seq()))
  }

  test("multi-byte UTF-8 patterns match at codepoint boundaries") {
    val got = scan(Seq("café au lait", "cafe"), Seq("é", "fé a", "lait"))
    assert(got == Seq(Seq(0, 1, 2), Seq()))
  }

  test("NULL text → NULL, repeated hits dedupe, ids stay sorted") {
    import spark.implicits._
    val got = Seq(Some("bab ab ab"), None).toDF("t")
      .select(multiContains(col("t"), Seq("ab", "ba")).as("m"))
      .collect()
    assert(got(0).getSeq[Int](0).toList == List(0, 1))
    assert(got(1).isNullAt(0))
  }

  test("randomized equivalence with naive contains over a small alphabet") {
    val rnd = new scala.util.Random(17)
    def rs(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val pats = Iterator.continually(rs(1 + rnd.nextInt(4)))
      .distinct.take(12).toSeq
    val texts = (1 to 200).map(_ => rs(rnd.nextInt(30)))
    val want = texts.map(t => pats.zipWithIndex.collect {
      case (p, i) if t.contains(p) => i
    }.toList)
    assert(scan(texts, pats) == want)
  }

  test("the scan stays codegen'd (no CodegenFallback in the plan)") {
    // a local Seq constant-folds to LocalTableScan; range forces a real
    // codegen stage around the expression
    val df = spark.range(3)
      .select(multiContains(concat(lit("x"), col("id").cast("string")),
        Seq("x1", "x2")).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in simpleString
    assert(plan.contains("*(1) Project [multi_contains"), plan)
    assert(df.collect().map(_.getSeq[Int](0).toList).toList ==
      List(List(), List(0), List(1)))
  }

  private def find(texts: Seq[String], pats: Seq[String]): Seq[Map[Int, Int]] = {
    import spark.implicits._
    texts.toDF("t")
      .select(graft.functions.MultiContains.multiFind(col("t"), pats).as("m"))
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getInt(0) -> r.getInt(1)).toMap).toList
  }

  test("multi_find: first occurrence only, 1-based char positions") {
    val got = find(Seq("xabab", "zzz"), Seq("ab", "b"))
    assert(got == Seq(Map(0 -> 2, 1 -> 3), Map.empty[Int, Int]))
  }

  test("multi_find: positions are CHAR positions through multi-byte text") {
    // é is 2 bytes; ≤ is 3 bytes — byte offsets would be 4 and 9
    val got = find(Seq("é≤xab"), Seq("ab", "x", "≤x"))
    assert(got == Seq(Map(0 -> 4, 1 -> 3, 2 -> 2)))
  }

  test("multi_find agrees with indexOf on random small-alphabet strings") {
    val rnd = new scala.util.Random(19)
    def rs(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val pats = Iterator.continually(rs(1 + rnd.nextInt(3)))
      .distinct.take(8).toSeq
    val texts = (1 to 120).map(_ => rs(rnd.nextInt(25)))
    val want = texts.map(t => pats.zipWithIndex.flatMap { case (p, i) =>
      val at = t.indexOf(p)
      if (at >= 0) Some(i -> (at + 1)) else None
    }.toMap)
    assert(find(texts, pats) == want)
  }

  test("empty or duplicate pattern lists are rejected loudly") {
    intercept[IllegalArgumentException] {
      graft.functions.MultiContains(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), Seq())
    }
    intercept[IllegalArgumentException] {
      graft.functions.MultiContains(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), Seq("a", "a"))
    }
  }
}
