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

  private def auc(rows: Seq[(Int, Long, Long)]): Map[Int, (Long, Long, Option[Long])] = {
    import spark.implicits._
    EvalMetrics.aucByLabel(rows.toDF("label", "score", "id"),
      "label", "score", "id")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
  }

  test("aucByLabel: perfect separation → 1e6, chance interleave → 500000") {
    // label 1 strictly above label 0 → AUC(1)=1e6, AUC(0)=0
    val sep = auc(Seq((0, 1L, 1L), (0, 2L, 2L), (1, 9L, 3L), (1, 10L, 4L)))
    assert(sep(1) == ((2L, 2L, Some(1000000L))))
    assert(sep(0) == ((2L, 2L, Some(0L))))
    // pos {3} vs neg {1,5}: ranks 1,2,3; R+=2 → (4−2)e6/(2·1·2)=500000
    val mid = auc(Seq((0, 1L, 1L), (1, 3L, 2L), (0, 5L, 3L)))
    assert(mid(1) == ((1L, 2L, Some(500000L))))
  }

  test("aucByLabel: single-label input reports NULL (empty rest class)") {
    val got = auc(Seq((7, 1L, 1L), (7, 2L, 2L)))
    assert(got(7) == ((2L, 0L, None)))
  }

  private def kappa(rows: Seq[(String, String)]): (Long, Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = EvalMetrics.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("cohenKappa: textbook confusion matrix [[20,5],[10,15]] → κ = 0.4") {
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    // po = 35/50, pe = (25·30 + 25·20)/2500 = 1/2, κ = 0.2/0.5 = 0.4
    assert(kappa(rows) == ((50L, 700000L, 500000L, Some(400000L))))
  }

  test("cohenKappa: perfect = 1e6, symmetric swap = −1e6, one class → NULL") {
    val perfect = Seq.fill(3)(("p", "p")) ++ Seq.fill(3)(("q", "q"))
    assert(kappa(perfect)._4.contains(1000000L))
    val swapped = Seq.fill(3)(("p", "q")) ++ Seq.fill(3)(("q", "p"))
    assert(kappa(swapped)._4.contains(-1000000L))
    val mono = Seq.fill(4)(("p", "p"))
    assert(kappa(mono) == ((4L, 1000000L, 1000000L, None)))
  }

  test("aucByLabel: score ties broken by id, deterministically") {
    // all scores equal → permutation is id order: ranks 1..4
    // label 1 holds ids 3,4 → R+=7 → (14−6)e6/8 = 1e6 × … = 1000000
    val got = auc(Seq((0, 5L, 1L), (0, 5L, 2L), (1, 5L, 3L), (1, 5L, 4L)))
    assert(got(1) == ((2L, 2L, Some(1000000L))))
    assert(got(0) == ((2L, 2L, Some(0L))))
  }

  private def lift(rows: Seq[(Long, Long, Int)], k: Int) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    EvalMetrics.liftTable(
      rows.toDF("id", "score", "label"), "score", "id",
      positive = col("label") === 1, k = k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
  }

  test("liftTable: perfect ranking — top half all positive, 2× lift") {
    // ids 1..4 score desc 40,30,20,10; labels 1,1,0,0; k=2
    val rows = Seq((1L, 40L, 1), (2L, 30L, 1), (3L, 20L, 0), (4L, 10L, 0))
    val got = lift(rows, 2)
    // bucket 1: 2 rows, 2 pos; cum lift = 2·4·1e6 / (2·2) = 2e6
    assert(got(1L) == ((2L, 2L, 2L, 2L, Some(2000000L))))
    // bucket 2: cumulative = whole population → exactly 1e6
    assert(got(2L) == ((2L, 0L, 4L, 2L, Some(1000000L))))
  }

  test("liftTable: matches SQL ntile bucket sizes on non-divisible n") {
    // n=5, k=2 → ntile sizes (3, 2); positives on ids 1,3,5
    val rows = Seq((1L, 50L, 1), (2L, 40L, 0), (3L, 30L, 1),
      (4L, 20L, 0), (5L, 10L, 1))
    val got = lift(rows, 2)
    // bucket 1 holds scores 50,40,30 → 2 pos; lift = 2·5e6/(3·3) = 1111111
    assert(got(1L) == ((3L, 2L, 3L, 2L, Some(1111111L))))
    assert(got(2L) == ((2L, 1L, 5L, 3L, Some(1000000L))))
  }

  test("liftTable: zero positives → NULL lift, counts intact") {
    val rows = Seq((1L, 9L, 0), (2L, 8L, 0), (3L, 7L, 0), (4L, 6L, 0))
    val got = lift(rows, 2)
    assert(got(1L) == ((2L, 0L, 2L, 0L, None)))
    assert(got(2L) == ((2L, 0L, 4L, 0L, None)))
  }
}
