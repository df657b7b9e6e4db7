package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextStats

class ReadabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("counts and ppm ratios match hand-computed sums; zero-sentence group is NULL") {
    import spark.implicits._
    val docs = Seq(
      ("a", "The cat sat. On a mat! Was it good?"), // 9 words, 3 sentences
      ("a", "Readability proxies are cheap."),      // 4 words, 1 sentence
      ("b", "no terminators here at all")).toDF("source", "text")
    val got = TextStats.readabilityStats(docs, "source", "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    // source a: 13 words, 4 sentence runs; vowel groups hand-counted:
    // "The cat sat. On a mat! Was it good?" → e,a,a,O,a,a,a,i,oo = 9
    // "Readability proxies are cheap." → ea,a,i,i,y?(no),o,ie,a,e,ea = ...
    val aV = Seq("the cat sat. on a mat! was it good?",
      "readability proxies are cheap.")
      .map("[aeiou]+".r.findAllIn(_).size).sum
    val a = got("a")
    assert((a._1, a._2, a._3, a._4) == ((2L, 13L, 4L, aV.toLong)))
    assert(a._5 == 13L * 1000000L / 4L)
    assert(a._6 == aV.toLong * 1000000L / 13L)
    // source b: zero sentences → NULL words_per_sentence, real syll ratio
    val b = got("b")
    assert(b._3 == 0L && b._5 == -1L)
    assert(b._6 == b._4 * 1000000L / b._2)
  }
}
