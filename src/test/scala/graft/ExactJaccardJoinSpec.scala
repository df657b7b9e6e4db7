package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

class ExactJaccardJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // brute-force all-pairs ground truth on normalized distinct word tokens
  private def refPairs(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Map[(Long, Long), (Int, Int)] = {
    def toks(s: String): Set[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSet
    val sets = docs.map { case (id, s) => id -> toks(s) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; union = (sa | sb).size
      if inter * tDen >= union * tNum
    } yield (ia, ib) -> ((inter, union))).toMap
  }

  private def run(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Map[(Long, Long), (Int, Int)] = {
    import spark.implicits._
    Dedup.exactJaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text",
      tNum, tDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3))))
      .toMap
  }

  test("prefix filtering loses nothing: random corpora match all-pairs at 3 thresholds") {
    val rng = new scala.util.Random(17)
    val pool = (1 to 40).map(i => s"tok$i")
    // overlapping token draws force many boundary-ish pairs
    val docs = (1L to 60L).map { id =>
      val base = rng.nextInt(8)
      val words = (0 until 6 + rng.nextInt(6))
        .map(_ => pool(math.min(base + rng.nextInt(12), pool.size - 1)))
      id -> words.mkString(" ")
    }
    for ((tn, td) <- Seq((1, 2), (2, 3), (7, 10))) {
      assert(run(docs, tn, td) == refPairs(docs, tn, td), s"threshold $tn/$td")
    }
  }

  test("boundary pairs at exactly the threshold are kept (integer arithmetic)") {
    // sets {a b c d} vs {a b c e}: intersect 3, union 5 → jaccard 0.6
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"))
    assert(run(docs, 3, 5) == Map((1L, 2L) -> ((3, 5))), "kept at 3/5")
    assert(run(docs, 2, 3) == Map.empty, "dropped above 3/5")
  }

  test("ngram mode matches an all-pairs 3-gram reference") {
    import spark.implicits._
    def grams(s: String): Set[String] = {
      val tk = s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSeq
      (0 to math.max(tk.size - 3, 0)).map(i =>
        tk.slice(i, i + 3).mkString(" ")).toSet
    }
    val rng = new scala.util.Random(29)
    val pool = (1 to 15).map(i => s"w$i")
    val docs = (1L to 40L).map { id =>
      val words = (0 until 8 + rng.nextInt(6)).map(_ => pool(rng.nextInt(pool.size)))
      id -> words.mkString(" ")
    }
    val expect = (for {
      (ia, sa) <- docs.map { case (i, s) => i -> grams(s) }
      (ib, sb) <- docs.map { case (i, s) => i -> grams(s) } if ia < ib
      inter = (sa & sb).size; union = (sa | sb).size
      if inter * 2 >= union
    } yield (ia, ib) -> ((inter, union))).toMap
    val got = Dedup.exactJaccardJoin(docs.toDF("doc_id", "text"),
      "doc_id", "text", 1, 2, ngram = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3))))
      .toMap
    assert(got == expect)
  }

  test("R-S join matches a cross-corpus all-pairs reference (ids may collide)") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val pool = (1 to 30).map(i => s"tok$i")
    def mk(n: Int): Seq[(Long, String)] = (1L to n.toLong).map { id =>
      val base = rng.nextInt(6)
      id -> (0 until 5 + rng.nextInt(6))
        .map(_ => pool(math.min(base + rng.nextInt(10), pool.size - 1)))
        .mkString(" ")
    }
    // overlapping id spaces on purpose: sides must not be conflated
    val (leftDocs, rightDocs) = (mk(35), mk(25))
    def toks(s: String): Set[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSet
    val expect = (for {
      (il, sl) <- leftDocs.map { case (i, s) => i -> toks(s) }
      (ir, sr) <- rightDocs.map { case (i, s) => i -> toks(s) }
      inter = (sl & sr).size; union = (sl | sr).size
      if inter * 3 >= union * 2
    } yield (il, ir) -> ((inter, union))).toMap
    val got = Dedup.exactJaccardJoinBetween(
      leftDocs.toDF("doc_id", "text"), "doc_id", "text",
      rightDocs.toDF("doc_id", "text"), "doc_id", "text", 2, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3))))
      .toMap
    assert(got == expect)
  }

  test("identical docs and disjoint docs behave at threshold 1") {
    val docs = Seq((1L, "x y z"), (2L, "z y x  "), (3L, "p q"))
    assert(run(docs, 1, 1) == Map((1L, 2L) -> ((3, 3))))
  }

  // directed all-pairs containment ground truth on unigram token sets
  private def refContainment(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Map[(Long, Long), (Int, Int)] = {
    def toks(s: String): Set[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSet
    val sets = docs.map { case (id, s) => id -> toks(s) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      inter = (sa & sb).size
      if inter * tDen >= sa.size * tNum
    } yield (ia, ib) -> ((inter, sa.size))).toMap
  }

  private def runContainment(docs: Seq[(Long, String)], tNum: Int, tDen: Int)
      : Map[(Long, Long), (Int, Int)] = {
    import spark.implicits._
    Dedup.exactContainmentJoin(docs.toDF("doc_id", "text"), "doc_id", "text",
      tNum, tDen, ngram = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(2), r.getInt(3))))
      .toMap
  }

  test("containment: probe-prefix × full-postings loses nothing vs directed all-pairs") {
    val rng = new scala.util.Random(53)
    val pool = (1 to 40).map(i => s"tok$i")
    // short docs drawn from long docs' vocabulary: forces asymmetric pairs
    // (short ⊂ long qualifies, long ⊄ short) that Jaccard would drop
    val docs = (1L to 60L).map { id =>
      val base = rng.nextInt(8)
      val len = if (id % 4 == 0) 3 + rng.nextInt(3) else 8 + rng.nextInt(8)
      val words = (0 until len)
        .map(_ => pool(math.min(base + rng.nextInt(12), pool.size - 1)))
      id -> words.mkString(" ")
    }
    for ((tn, td) <- Seq((1, 2), (2, 3), (9, 10))) {
      assert(runContainment(docs, tn, td) == refContainment(docs, tn, td),
        s"threshold $tn/$td")
    }
  }

  test("containment is directed: subset qualifies, superset direction does not") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d e f"))
    // 1→2: |{a,b,c}∩…|/3 = 1; 2→1: 3/6 = 0.5 < 2/3
    assert(runContainment(docs, 2, 3) == Map((1L, 2L) -> ((3, 3))))
    // at 1/2 both directions qualify
    assert(runContainment(docs, 1, 2) ==
      Map((1L, 2L) -> ((3, 3)), (2L, 1L) -> ((3, 6))))
  }
}
