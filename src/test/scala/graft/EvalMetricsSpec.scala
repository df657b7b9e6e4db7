package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.EvalMetrics

class EvalMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(pairs: Seq[(Long, String, String)], n: Int = 2)
      : Map[Long, Seq[Long]] = {
    import spark.implicits._
    EvalMetrics.rougeN(pairs.toDF("pid", "ref", "cand"), "pid", "ref", "cand", n)
      .collect()
      .map(r => r.getLong(0) -> (1 to 6).map(i => r.getLong(i)).toList)
      .toMap
  }

  test("ROUGE-2 hand case with multiset clipping") {
    // ref  bigrams: "a b","b a","a b","b c"  → {a b:2, b a:1, b c:1}
    // cand bigrams: "a b","b a","a b","b a","a b" → {a b:3, b a:2}
    // overlap = min(2,3) + min(1,2) = 3; n_ref=4, n_cand=5
    val got = run(Seq((1L, "a b a b c", "a b a b a b")))
    val Seq(nRef, nCand, ov, p, r, f1) = got(1L)
    assert((nRef, nCand, ov) == ((4L, 5L, 3L)))
    assert(p == 3L * 1000000 / 5)  // 600000
    assert(r == 3L * 1000000 / 4)  // 750000
    assert(f1 == 2 * 3L * 1000000 / 9) // 666666
  }

  test("identical texts score 10^6 across the board; disjoint score 0") {
    val got = run(Seq(
      (1L, "x y z w", "x y z w"),
      (2L, "x y z w", "p q r s")))
    assert(got(1L) == Seq(3L, 3L, 3L, 1000000L, 1000000L, 1000000L))
    assert(got(2L) == Seq(3L, 3L, 0L, 0L, 0L, 0L))
  }

  test("short and empty sides yield zero grams, zero scores, no dropped rows") {
    val got = run(Seq(
      (1L, "one", ""),          // both sides < 2 tokens
      (2L, "", "a b c"),        // empty reference
      (3L, "a b", "solo")))     // candidate too short
    assert(got(1L) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
    assert(got(2L) == Seq(0L, 2L, 0L, 0L, 0L, 0L))
    assert(got(3L) == Seq(1L, 0L, 0L, 0L, 0L, 0L))
  }

  test("normalization applies (case and punctuation collapse before grams)") {
    val got = run(Seq((1L, "Hello, World! again", "hello world AGAIN")))
    assert(got(1L) == Seq(2L, 2L, 2L, 1000000L, 1000000L, 1000000L))
  }

  test("ROUGE-1 is token-level overlap") {
    val got = run(Seq((1L, "a a b", "a c c")), n = 1)
    // ref {a:2, b:1}, cand {a:1, c:2} → overlap 1; P=1/3, R=1/3
    assert(got(1L) == Seq(3L, 3L, 1L, 333333L, 333333L, 333333L))
  }
}
