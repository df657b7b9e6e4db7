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
