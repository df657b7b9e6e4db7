package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TfIdf

class TfIdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("distinctiveTerms: exclusive terms outrank shared ones, exact ppm") {
    import spark.implicits._
    val docs = Seq(
      ("A", "apple apple banana"),
      ("B", "banana cherry cherry")
    ).toDF("source", "text")
    val got = TfIdf.distinctiveTerms(docs, "source", "text", k = 2)
      .collect()
      .map(r => (r.getString(0), r.getInt(4)) -> ((r.getString(1), r.getLong(3))))
      .toMap
    // A: apple  c=2,S=3,T=2,G=6 → 2·3·1e6 div (3·1) = 2_000_000
    //    banana c=1,S=3,T=2,G=6 → 1·3·1e6 div (3·2) =   500_000
    assert(got(("A", 1)) == (("apple", 2000000L)))
    assert(got(("A", 2)) == (("banana", 500000L)))
    assert(got(("B", 1)) == (("cherry", 2000000L)))
  }

  test("topTerms: tf/df ranks doc-frequent, corpus-rare terms first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y"), (2L, "y z")
    ).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "x") // tf 2, df 1 → score 2; y is 1/2
    assert(got(2L) == "z") // tf 1, df 1 → 1; y is 1/2
  }
}
