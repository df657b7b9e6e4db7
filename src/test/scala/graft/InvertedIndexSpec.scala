package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.DatasetComparisons._
import graft.llm.InvertedIndex

class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("postings carry tf and the 0-based first position per (term, doc)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "The Mat!")).toDF("id", "text")
    val got = InvertedIndex.postings(docs, "id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("the", 1L)) == ((2L, 0L)))
    assert(got(("cat", 1L)) == ((1L, 1L)))
    assert(got(("mat", 1L)) == ((1L, 5L)))
    // normalization lowercases and strips punctuation before positions
    assert(got(("the", 2L)) == ((1L, 0L)))
    assert(got(("mat", 2L)) == ((1L, 1L)))
    assert(got.size == 7)  // the,cat,sat,on,mat @1 + the,mat @2
  }

  test("bm25 ranks the doc with more distinct rare query terms first") {
    import spark.implicits._
    val filler = (1 to 30).map(i => (100L + i, "common words only here"))
    val docs = (Seq(
      (1L, "needle needle needle common"),
      (2L, "needle haystack common words"),
      (3L, "common words only")) ++ filler).toDF("id", "text")
    val got = InvertedIndex.bm25TopK(docs, "id", "text",
      Seq("needle", "haystack"), k = 5)
      .orderBy("rank").collect().map(_.getLong(0))
    // doc 2 matches BOTH rare terms; doc 1 matches one (thrice); filler none
    assert(got.toSeq == Seq(2L, 1L))
  }

  test("bm25 length normalization: same tf prefers the shorter doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "needle a"),
      (2L, "needle a b c d e f g h i j k l m n o p q r s t")).toDF("id", "text")
    val got = InvertedIndex.bm25TopK(docs, "id", "text", Seq("needle"), k = 2)
      .orderBy("rank").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 2L))
  }

  test("scores are exact integers, deterministic under repartitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "query1", "query2")
    val docs = (0L until 300L).map { i =>
      val n = rng.nextInt(20) + 3
      (i, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    val a = InvertedIndex.bm25TopK(docs, "id", "text",
      Seq("query1", "query2"), k = 25)
    val b = InvertedIndex.bm25TopK(docs.repartition(17), "id", "text",
      Seq("query1", "query2"), k = 25)
    a.ensureDatasetEquals(b)
    assert(a.count() == 25)
  }

  test("duplicate query terms are rejected") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      InvertedIndex.bm25TopK(docs, "id", "text", Seq("x", "x"))
    }
  }
}
