package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Vocab

/** [[Vocab.pmiCollocations]] (integer PMI-lift collocations) and
  * [[Vocab.zipfHistogram]] (floor-log2 frequency spectrum) against
  * hand-computed tiny corpora. */
class VocabCollocationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pmiCollocations: hand-checked lifts, deterministic tie order") {
    import spark.implicits._
    // tokens doc1: [new, york, new, york, city]; doc2: [the, new, york]
    // unigrams: new=3, york=3, city=1, the=1; N=8
    // pairs: (new,york)x3, (york,new)x1, (york,city)x1, (the,new)x1
    val df = Seq("new york new york city", "the new york").toDF("text")
    val got = Vocab.pmiCollocations(df, "text", minCount = 1L, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(5)))
      .toList
    // lift(new,york) = 3*8e6/(3*3) = 2666666; (the,new) = 8e6/3 = 2666666;
    // (york,city) = 8e6/3 = 2666666; (york,new) = 8e6/9 = 888888.
    // Equal lifts order by (w1, w2).
    assert(got == List(
      ("new", "york", 3L, 2666666L),
      ("the", "new", 1L, 2666666L),
      ("york", "city", 1L, 2666666L),
      ("york", "new", 1L, 888888L)))
  }

  test("pmiCollocations: minCount prunes before scoring, k caps output") {
    import spark.implicits._
    val df = Seq("new york new york city", "the new york").toDF("text")
    val pruned = Vocab.pmiCollocations(df, "text", minCount = 2L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(pruned == List(("new", "york")))
    val capped = Vocab.pmiCollocations(df, "text", minCount = 1L, k = 2)
    assert(capped.count() == 2L)
  }

  test("pmiCollocations: single-token and empty docs contribute no pairs") {
    import spark.implicits._
    val df = Seq("solo", "", "a b").toDF("text")
    val got = Vocab.pmiCollocations(df, "text", minCount = 1L, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toList == List(("a", "b", 1L)))
  }

  test("zipfHistogram: hand-checked floor-log2 buckets") {
    import spark.implicits._
    // counts: a=4 (bucket 2), b=2 (bucket 1), c=1, d=1 (bucket 0)
    val df = Seq("a a b c", "a a b d").toDF("text")
    val got = Vocab.zipfHistogram(df, "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      0L -> ((2L, 2L, 1L, 1L)),
      1L -> ((1L, 2L, 2L, 2L)),
      2L -> ((1L, 4L, 4L, 4L))))
  }
}
